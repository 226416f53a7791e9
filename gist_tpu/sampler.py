"""Cluster-GCN mini-batch sampler — the ClusterIter analog
(reference: cluster_gcn/sampler.py:11-93), with TPU static-shape
bucketing.

Differences from the reference, all deliberate:

* Induced cluster subgraphs vary in node/edge count every batch; jit
  would recompile per shape.  Batches are therefore padded to geometric
  size buckets (growth factor ~1.2 → at most ~log_{1.2} distinct
  compiled shapes, ~10% average padding overhead, excluded from
  edges/sec accounting by callers via ``ClusterBatch.n_real_edges``).
* The METIS partition cache race (every rank writing the same .npy,
  sampler.py:44-51) is fixed with an atomic rename in
  gist_tpu.partition.get_partition_list.
* ``use_pp`` first-layer precomputation (sampler.py:58-69) stores
  ``[X || (A X) * deg^{-1}]`` — and the model must then *skip* first
  layer aggregation during training; our SAGE stack honors that
  (fixing the latent double-aggregation defect, SURVEY §2.4).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from gist_tpu.data.container import Dataset
from gist_tpu.graph import Graph, graph_from_edges, subgraph
from gist_tpu.partition import get_partition_list


def bucket_size(n: int, growth: float = 1.2, min_size: int = 256) -> int:
    """Smallest bucket >= n from the geometric series min_size*growth^k."""
    if n <= min_size:
        return min_size
    k = math.ceil(math.log(n / min_size) / math.log(growth))
    return int(math.ceil(min_size * growth ** k))


@struct.dataclass
class ClusterBatch:
    """A padded training batch: induced subgraph + node data.

    Two forms: *inline* (features/labels/train_mask materialized per
    batch) and *ids* (``node_ids`` into the sampler's device-resident
    tables, padding rows pointing at the appended zero row).  The ids
    form ships ~100x fewer feature bytes to the device per epoch —
    host->device bandwidth, not compute, dominates scan-fused epochs
    on big clustered graphs."""
    graph: Graph
    features: Optional[jnp.ndarray]    # (N_pad, F) or None (ids form)
    labels: Optional[jnp.ndarray]      # (N_pad,) or None
    train_mask: Optional[jnp.ndarray]  # (N_pad,) — False on padding
    n_real_nodes: int = struct.field(pytree_node=False)
    n_real_edges: int = struct.field(pytree_node=False)
    node_ids: Optional[jnp.ndarray] = None  # (N_pad,) into tables()


def unify_tile_buckets(batches: List[ClusterBatch]) -> List[ClusterBatch]:
    """Re-pad per-batch Pallas dedup tile layouts to one common bucket
    so a round of batches can stack on a scan axis.

    ``make_batch`` buckets each batch's job count independently
    (``_with_bucketed_tiles``); two batches of one scanned round whose
    job counts straddle a geometric bucket boundary would carry
    different ``w_blocks`` shapes and static ``max_jobs``, and
    ``jax.tree.map(stack)`` would raise.  This unifies the buckets the
    same way node_pad/edge_pad are unified by the round collectors.
    Batches where tile building bailed (``None`` layout) force tiles
    off for the whole round — one scan needs one pytree structure."""
    batches = _unify_gather_tiles(batches)
    graphs = [b.graph for b in batches]
    have = [g.dedup is not None and g.dedup_t is not None for g in graphs]
    if not all(have):
        if any(g.dedup is not None or g.dedup_t is not None
               for g in graphs):
            batches = [
                b.replace(graph=b.graph.replace(dedup=None, dedup_t=None))
                for b in batches]
        return batches
    from gist_tpu.graph import pad_dedup_tiles

    def pads(ds):
        return (max(int(np.asarray(d.w_blocks).shape[0]) for d in ds),
                max(d.max_jobs for d in ds))

    jb, mj = pads([g.dedup for g in graphs])
    jbt, mjt = pads([g.dedup_t for g in graphs])
    out = []
    for b in batches:
        g = b.graph
        as_np = isinstance(g.dedup.w_blocks, np.ndarray)
        if (int(np.asarray(g.dedup.w_blocks).shape[0]) == jb
                and g.dedup.max_jobs == mj
                and int(np.asarray(g.dedup_t.w_blocks).shape[0]) == jbt
                and g.dedup_t.max_jobs == mjt):
            out.append(b)
            continue
        out.append(b.replace(graph=g.replace(
            dedup=pad_dedup_tiles(g.dedup, jb, mj, as_numpy=as_np),
            dedup_t=pad_dedup_tiles(g.dedup_t, jbt, mjt, as_numpy=as_np))))
    return out


def _unify_gather_tiles(batches: List[ClusterBatch]) -> List[ClusterBatch]:
    """The v1 TiledCSR analog of the dedup unification (GAT rounds)."""
    graphs = [b.graph for b in batches]
    have = [g.tiled is not None and g.tiled_t is not None for g in graphs]
    if not all(have):
        if any(g.tiled is not None or g.tiled_t is not None
               for g in graphs):
            batches = [
                b.replace(graph=b.graph.replace(tiled=None, tiled_t=None))
                for b in batches]
        return batches
    from gist_tpu.graph import pad_tiled_csr

    def pads(ts):
        return (max(int(np.asarray(t.senders).shape[0]) for t in ts),
                max(t.max_chunks for t in ts))

    eb, mc = pads([g.tiled for g in graphs])
    ebt, mct = pads([g.tiled_t for g in graphs])
    out = []
    for b in batches:
        g = b.graph
        as_np = isinstance(g.tiled.senders, np.ndarray)
        if (int(np.asarray(g.tiled.senders).shape[0]) == eb
                and g.tiled.max_chunks == mc
                and int(np.asarray(g.tiled_t.senders).shape[0]) == ebt
                and g.tiled_t.max_chunks == mct):
            out.append(b)
            continue
        out.append(b.replace(graph=g.replace(
            tiled=pad_tiled_csr(g.tiled, eb, mc, as_numpy=as_np),
            tiled_t=pad_tiled_csr(g.tiled_t, ebt, mct, as_numpy=as_np))))
    return out


class ClusterSampler:
    """Iterates ``psize // batch_size`` padded cluster batches per epoch,
    reshuffling cluster order between epochs (sampler.py:55, 92-93)."""

    def __init__(
        self,
        ds: Dataset,
        psize: int,
        batch_size: int,
        *,
        use_pp: bool = False,
        cache_dir: Optional[str] = None,
        seed: int = 0,
        bucket_growth: float = 1.2,
        tiles: Optional[bool] = None,
        tiles_min_edges: int = 200_000,
        tile_mode: str = "dedup",
    ):
        """``tiles=None`` (auto): build the Pallas tile layout on
        each batch when a pallas-capable backend is active AND batches
        are big enough for the kernel to pay off (``tiles_min_edges``);
        tile shapes are padded to the same geometric buckets as
        nodes/edges so jit caches per bucket.

        ``tile_mode``: ``"dedup"`` (default) builds the block-dense
        unique-sender layout the SpMM kernel consumes (GCN/SAGE);
        ``"gather"`` builds the v1 edge-order TiledCSR pair the fused
        GAT attention kernel needs (ops/pallas_gat.py) — GAT trainers
        set this so ``--spmm-backend auto`` composes with the fused
        kernel without caller knowledge."""
        assert tile_mode in ("dedup", "gather"), tile_mode
        self.psize = psize
        self.batch_size = batch_size
        self.use_pp = use_pp
        self.rng = np.random.default_rng(seed)
        self.bucket_growth = bucket_growth
        self.tiles = tiles
        self.tiles_min_edges = tiles_min_edges
        self.tile_mode = tile_mode

        # restrict to the train-node-induced subgraph (sampler.py:34)
        train_nid = np.nonzero(ds.train_mask)[0]
        s, r, _ = subgraph(ds.senders, ds.receivers, train_nid, ds.n_nodes)
        self.senders, self.receivers = s, r
        self.n_nodes = len(train_nid)
        self.features = ds.features[train_nid]
        # multitask datasets (ppi) train on the (N, C) multi-hot matrix
        # with sigmoid BCE; batches/tables then carry 2-D float labels
        self.labels = ds.labels_multi[train_nid].astype(np.float32) \
            if ds.labels_multi is not None else ds.labels[train_nid]
        self.train_mask = ds.train_mask[train_nid]  # all True by construction

        if use_pp:
            self.features = self._precalc(self.features)

        self.partitions: List[np.ndarray] = get_partition_list(
            self.senders, self.receivers, self.n_nodes, psize,
            cache_dir=cache_dir, name=ds.name, seed=seed)
        self._order = np.arange(len(self.partitions))
        self.rng.shuffle(self._order)

        # receiver-sorted CSR over the train subgraph: batch extraction
        # then touches only the batch's incident edges (O(sum deg)).
        # Scanning the whole edge list per batch — as g.subgraph must —
        # is O(E) per batch and unusable at Amazon2M scale (85M train
        # edges x 1500 batches/epoch).
        order = np.argsort(self.receivers, kind="stable")
        self._csr_senders = self.senders[order]
        deg = np.bincount(self.receivers, minlength=self.n_nodes)
        self._csr_indptr = np.zeros(self.n_nodes + 1, np.int64)
        np.cumsum(deg, out=self._csr_indptr[1:])
        # stamped scratch map: avoids an O(N) reset per batch
        self._map_local = np.zeros(self.n_nodes, np.int64)
        self._map_gen = np.zeros(self.n_nodes, np.int64)
        self._gen = 0

    def csr_subgraph(self, node_ids: np.ndarray):
        """Induced subgraph of ``node_ids`` via the receiver-sorted CSR
        index: returns ``(senders, receivers)`` relabeled to
        [0, len(node_ids)) in node_ids order (same contract as
        graph.subgraph), touching only the batch's incident edges.
        Public API — round collectors extract edges once through this,
        then re-pad via ``make_batch(..., edges=...)``."""
        ptr, cs = self._csr_indptr, self._csr_senders
        lo, hi = ptr[node_ids], ptr[node_ids + 1]
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            z = np.zeros(0, np.int64)
            return z, z
        starts = np.zeros(len(node_ids), np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        idx = np.repeat(lo - starts, cnt) + np.arange(total)
        dst_local = np.repeat(np.arange(len(node_ids), dtype=np.int64), cnt)
        src_global = cs[idx]
        self._gen += 1
        self._map_local[node_ids] = np.arange(len(node_ids))
        self._map_gen[node_ids] = self._gen
        keep = self._map_gen[src_global] == self._gen
        return self._map_local[src_global[keep]], dst_local[keep]

    # backwards-compat alias (pre-round-3 private name)
    _csr_subgraph = csr_subgraph

    def _with_bucketed_tiles(self, g: Graph, numpy: bool = False) -> Graph:
        """Pallas tile layout with sizes padded to geometric buckets
        (cluster batch nodes are already cluster-grouped, so no extra
        locality reorder)."""
        gr = self.bucket_growth
        s = np.asarray(g.senders[:g.n_edges]).astype(np.int64)
        r = np.asarray(g.receivers[:g.n_edges]).astype(np.int64)
        t_s = np.asarray(g.t_senders[:g.n_edges]).astype(np.int64)
        t_r = np.asarray(g.t_receivers[:g.n_edges]).astype(np.int64)
        if self.tile_mode == "gather":
            from gist_tpu.graph import (_build_tiled_csr, _link_tiled_pair,
                                        pad_tiled_csr)
            indptr = np.asarray(g.indptr, np.int64)
            t_indptr = np.asarray(g.t_indptr, np.int64)
            tiled, f_dst = _build_tiled_csr(
                s.astype(np.int32), r.astype(np.int32), indptr, g.n_nodes)
            tiled_t, t_dst = _build_tiled_csr(
                t_s.astype(np.int32), t_r.astype(np.int32), t_indptr,
                g.n_nodes)
            t_order = np.argsort(s, kind="stable")
            tiled, tiled_t = _link_tiled_pair(tiled, f_dst, tiled_t, t_dst,
                                              t_order, g.n_edges)
            tiled = pad_tiled_csr(
                tiled, bucket_size(int(tiled.senders.shape[0]), gr, 1024),
                bucket_size(max(tiled.max_chunks, 1), gr, 1),
                as_numpy=numpy)
            tiled_t = pad_tiled_csr(
                tiled_t,
                bucket_size(int(tiled_t.senders.shape[0]), gr, 1024),
                bucket_size(max(tiled_t.max_chunks, 1), gr, 1),
                as_numpy=numpy)
            return g.replace(tiled=tiled, tiled_t=tiled_t)
        from gist_tpu.graph import _build_dedup_tiles, pad_dedup_tiles
        d = _build_dedup_tiles(s, r, g.n_nodes, reorder=False,
                               as_numpy=numpy)
        d_t = None if d is None else _build_dedup_tiles(
            t_s, t_r, g.n_nodes, reorder=False, as_numpy=numpy)
        if d is None or d_t is None:
            return g
        d = pad_dedup_tiles(d, bucket_size(int(d.w_blocks.shape[0]), gr, 8),
                            bucket_size(d.max_jobs, gr, 4), as_numpy=numpy)
        d_t = pad_dedup_tiles(
            d_t, bucket_size(int(d_t.w_blocks.shape[0]), gr, 8),
            bucket_size(d_t.max_jobs, gr, 4), as_numpy=numpy)
        return g.replace(dedup=d, dedup_t=d_t)

    def _precalc(self, feats: np.ndarray) -> np.ndarray:
        """[X || (A X) * 1/deg] on the train subgraph (sampler.py:58-69)."""
        agg = np.zeros_like(feats, dtype=np.float64)
        np.add.at(agg, self.receivers, feats[self.senders].astype(np.float64))
        deg = np.bincount(self.receivers, minlength=self.n_nodes
                          ).astype(np.float64)
        inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
        return np.concatenate(
            [feats, (agg * inv[:, None]).astype(np.float32)], axis=1)

    def __len__(self) -> int:
        return self.psize // self.batch_size

    def _epoch_ids(self) -> Iterator[np.ndarray]:
        """One epoch of per-batch node-id arrays; advances the cluster
        order (sampler.py:55, 92-93).  The single source of epoch
        semantics — all consumers (``__iter__``, round collectors)
        derive from this so they cannot drift."""
        order = self._order.copy()
        self.rng.shuffle(self._order)
        for i in range(len(self)):
            ids = order[i * self.batch_size:(i + 1) * self.batch_size]
            yield np.concatenate([self.partitions[j] for j in ids])

    def iter_node_ids(self) -> Iterator[np.ndarray]:
        """Endless stream of batch node-id arrays, reshuffling between
        epochs."""
        while True:
            yield from self._epoch_ids()

    def __iter__(self) -> Iterator[ClusterBatch]:
        for node_ids in self._epoch_ids():
            yield self.make_batch(node_ids)

    @staticmethod
    def resolve_batch(batch, tables):
        """One scan step's (graph, feats, labels, mask) from either
        batch form: inline 4-tuples pass through; ids 2-tuples gather
        node rows from ``tables()`` inside the jitted step."""
        if len(batch) == 4:
            return batch
        graph, ids = batch
        ft, lt, mt = tables
        return (graph, jnp.take(ft, ids, axis=0),
                jnp.take(lt, ids, axis=0), jnp.take(mt, ids))

    def tables(self):
        """Device-resident (features, labels, train_mask) over the
        train subgraph with a zero row appended — the gather target of
        ids-form batches (padding ids point at the zero row).  Built
        once, cached."""
        if not hasattr(self, "_tables"):
            f = np.concatenate(
                [self.features,
                 np.zeros((1, self.features.shape[1]), np.float32)])
            l = np.concatenate(
                [self.labels,
                 np.zeros((1,) + self.labels.shape[1:], self.labels.dtype)])
            m = np.concatenate([self.train_mask, np.zeros(1, bool)])
            self._tables = (jnp.asarray(f), jnp.asarray(l), jnp.asarray(m))
        return self._tables

    def make_batch(self, node_ids: np.ndarray,
                   node_pad: Optional[int] = None,
                   edge_pad: Optional[int] = None,
                   edges: Optional[tuple] = None,
                   numpy: bool = False,
                   ids_only: bool = False) -> ClusterBatch:
        """``edges`` passes a precomputed ``csr_subgraph`` result
        (round collectors extract once, then re-pad).  ``numpy=True``
        keeps every leaf on the host so a whole epoch can be stacked
        into one device transfer instead of one per batch.
        ``ids_only=True`` produces the ids batch form (see
        ClusterBatch)."""
        node_ids = np.asarray(node_ids, dtype=np.int64)
        s, r = edges if edges is not None else self.csr_subgraph(node_ids)
        n = len(node_ids)
        n_pad = node_pad or bucket_size(n, self.bucket_growth)
        e_pad = edge_pad or bucket_size(max(len(s), 1), self.bucket_growth)
        g = graph_from_edges(s, r, n_pad, pad_to=e_pad, numpy=numpy)
        tiles = self.tiles
        if tiles is None:
            from gist_tpu.ops.spmm import tiles_wanted
            tiles = tiles_wanted() and len(s) >= self.tiles_min_edges
        if tiles:
            g = self._with_bucketed_tiles(g, numpy=numpy)

        conv = np.asarray if numpy else jnp.asarray
        if ids_only:
            ids = np.full(n_pad, self.n_nodes, np.int32)  # -> zero row
            ids[:n] = node_ids
            return ClusterBatch(
                graph=g, features=None, labels=None, train_mask=None,
                n_real_nodes=n, n_real_edges=len(s), node_ids=conv(ids))

        feats = np.zeros((n_pad, self.features.shape[1]), np.float32)
        feats[:n] = self.features[node_ids]
        labels = np.zeros((n_pad,) + self.labels.shape[1:],
                          self.labels.dtype)
        labels[:n] = self.labels[node_ids]
        mask = np.zeros((n_pad,), bool)
        mask[:n] = self.train_mask[node_ids]
        return ClusterBatch(
            graph=g,
            features=conv(feats),
            labels=conv(labels),
            train_mask=conv(mask),
            n_real_nodes=n,
            n_real_edges=len(s),
        )
