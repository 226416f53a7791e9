// Native graph partitioner: BFS graph-growing over CSR.
//
// TPU-native replacement for the METIS dependency behind
// dgl.transform.metis_partition (reference: partition_utils.py:11-18).
// The Python fallback (greedy.py) is identical but ~100x slower on
// multi-million-edge graphs (Amazon2M startup partitioning is a hot
// preprocessing path, SURVEY.md §3.4 "hot loops ranked" #2).
//
// Build: make -C gist_tpu/partition  (produces libgistpart.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Assign each node to one of `psize` clusters by BFS growth from random
// seeds.  `assignment` must hold n_nodes int64s; filled with cluster ids.
void greedy_partition(const int64_t* indptr, const int64_t* nbrs,
                      int64_t n_nodes, int64_t psize, uint64_t seed,
                      int64_t* assignment) {
  if (psize <= 1) {
    std::memset(assignment, 0, sizeof(int64_t) * n_nodes);
    return;
  }
  const int64_t target = n_nodes / psize > 0 ? n_nodes / psize : 1;
  std::vector<int64_t> visit(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) visit[i] = i;
  // xorshift shuffle (deterministic per seed)
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
  auto next = [&s]() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s;
  };
  for (int64_t i = n_nodes - 1; i > 0; --i) {
    int64_t j = (int64_t)(next() % (uint64_t)(i + 1));
    std::swap(visit[i], visit[j]);
  }

  std::fill(assignment, assignment + n_nodes, (int64_t)-1);
  std::vector<int64_t> frontier;
  frontier.reserve(1024);
  int64_t visit_ptr = 0;

  for (int64_t pid = 0; pid < psize; ++pid) {
    int64_t members = 0;
    frontier.clear();
    while (members < target) {
      if (frontier.empty()) {
        while (visit_ptr < n_nodes && assignment[visit[visit_ptr]] >= 0)
          ++visit_ptr;
        if (visit_ptr >= n_nodes) break;
        int64_t sd = visit[visit_ptr];
        assignment[sd] = pid;
        ++members;
        frontier.push_back(sd);
        continue;
      }
      int64_t u = frontier.back();
      frontier.pop_back();
      for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        int64_t v = nbrs[e];
        if (assignment[v] < 0) {
          assignment[v] = pid;
          ++members;
          frontier.push_back(v);
          if (members >= target) break;
        }
      }
    }
  }
  // stragglers round-robin into clusters
  int64_t pid = 0;
  for (int64_t i = 0; i < n_nodes; ++i) {
    if (assignment[i] < 0) {
      assignment[i] = pid;
      pid = (pid + 1) % psize;
    }
  }
}

// Relabel a node-induced subgraph: given a sorted node id set, emit the
// edges with both endpoints inside, relabeled to [0, n_sub).  Returns
// the number of edges written.  `mapping` is scratch of size n_nodes
// (filled by this call).  Used by the cluster sampler hot path.
int64_t induced_subgraph(const int64_t* senders, const int64_t* receivers,
                         int64_t n_edges, const int64_t* node_ids,
                         int64_t n_sub, int64_t n_nodes, int64_t* mapping,
                         int64_t* out_senders, int64_t* out_receivers) {
  std::fill(mapping, mapping + n_nodes, (int64_t)-1);
  for (int64_t i = 0; i < n_sub; ++i) mapping[node_ids[i]] = i;
  int64_t m = 0;
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t ss = mapping[senders[e]];
    int64_t rr = mapping[receivers[e]];
    if (ss >= 0 && rr >= 0) {
      out_senders[m] = ss;
      out_receivers[m] = rr;
      ++m;
    }
  }
  return m;
}

}  // extern "C"
