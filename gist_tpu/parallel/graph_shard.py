"""Edge-partitioned multi-chip SpMM with boundary halo exchange.

One graph's nodes are partitioned across the ``graph`` mesh axis
(locality-preserving partitioner → fewer cut edges → smaller halos);
each device owns a contiguous relabeled node range, its nodes'
features, and all edges whose *receiver* it owns.  Aggregation:

  1. every device gathers the boundary rows its peers need
     (``send_idx``, precomputed host-side) — one gather;
  2. one ``all_to_all`` over the mesh axis exchanges the halo blocks
     (rides ICI; block sizes padded to the max halo so shapes are
     static);
  3. local SpMM over ``[x_local ; halo]`` with pre-remapped sender
     indices — no further communication.

Comm volume per step = sum of cut-edge-unique boundary rows, vs the
reference's every-rank-holds-everything (no exchange, full replication
— ist_distrib.py:482-517).  This is the framework's new scaling axis
(BASELINE.md north star).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class ShardedGraph:
    """All arrays carry a leading (D,) device axis, sharded over the
    ``graph`` mesh axis by the caller.  Sender indices address the
    per-device ``[x_local (n_loc_pad) ; halo (D * halo_pad)]`` stack."""

    senders: jnp.ndarray      # (D, E_pad) int32
    receivers: jnp.ndarray    # (D, E_pad) int32; padding == n_loc_pad
    send_idx: jnp.ndarray     # (D, D, halo_pad) int32 local rows to send
    in_degrees: jnp.ndarray   # (D, n_loc_pad) float32 (true degree)
    out_degrees: jnp.ndarray  # (D, n_loc_pad) float32
    node_perm: jnp.ndarray    # (N,) original -> shard order
    # interior/boundary split of the same edges (for overlapping the
    # halo all_to_all with the interior SpMM): interior senders index
    # x_local, boundary senders index the halo stack (offset removed)
    int_senders: jnp.ndarray  # (D, Ei_pad)
    int_receivers: jnp.ndarray
    bnd_senders: jnp.ndarray  # (D, Eb_pad) — index into halo (D*halo_pad)
    bnd_receivers: jnp.ndarray
    n_nodes: int = struct.field(pytree_node=False)      # original N
    n_devices: int = struct.field(pytree_node=False)
    n_loc_pad: int = struct.field(pytree_node=False)
    halo_pad: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)

    @property
    def total_rows(self) -> int:
        return self.n_devices * self.n_loc_pad


def build_sharded_graph(senders, receivers, n_nodes: int, n_devices: int,
                        *, parts: Optional[List[np.ndarray]] = None,
                        seed: int = 0) -> ShardedGraph:
    """Host-side preprocessing.  ``parts`` (optional) is a list of
    n_devices disjoint node-id arrays; defaults to the BFS partitioner.
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    D = n_devices
    if parts is None:
        from gist_tpu.partition import get_partition_list
        parts = get_partition_list(senders, receivers, n_nodes, D, seed=seed)
    assert len(parts) == D

    # relabel: device d owns new ids [d*n_loc_pad, d*n_loc_pad + len(parts[d]))
    n_loc_pad = _round_up(max(max(len(p) for p in parts), 1), 8)
    perm = np.full(n_nodes, -1, dtype=np.int64)       # old -> new
    owner = np.empty(n_nodes, dtype=np.int64)
    local_of = np.empty(n_nodes, dtype=np.int64)
    for d, p in enumerate(parts):
        perm[p] = d * n_loc_pad + np.arange(len(p))
        owner[p] = d
        local_of[p] = np.arange(len(p))
    assert (perm >= 0).all(), "parts must cover all nodes"

    e_owner = owner[receivers]
    # halo needs: unique remote senders per (dst_device, src_device)
    need: List[List[np.ndarray]] = [[None] * D for _ in range(D)]
    halo_max = 1
    for i in range(D):
        mask_i = e_owner == i
        s_i = senders[mask_i]
        for j in range(D):
            remote = np.unique(local_of[s_i[(owner[s_i] == j)
                                            & (owner[s_i] != i)]])
            need[i][j] = remote
            halo_max = max(halo_max, len(remote))
    halo_pad = _round_up(halo_max, 8)

    send_idx = np.zeros((D, D, halo_pad), dtype=np.int64)
    for i in range(D):
        for j in range(D):
            send_idx[j, i, :len(need[i][j])] = need[i][j]

    # per-device edge lists with remapped senders, plus the
    # interior/boundary split used to overlap comm and compute
    e_pad = _round_up(max(int((e_owner == i).sum()) for i in range(D)) or 1, 8)
    s_out = np.zeros((D, e_pad), dtype=np.int64)
    r_out = np.full((D, e_pad), n_loc_pad, dtype=np.int64)
    int_s, int_r, bnd_s, bnd_r = [], [], [], []
    for i in range(D):
        mask_i = e_owner == i
        s_i, r_i = senders[mask_i], receivers[mask_i]
        local_senders = np.empty(len(s_i), dtype=np.int64)
        is_local = owner[s_i] == i
        local_senders[is_local] = local_of[s_i[is_local]]
        for j in range(D):
            m = (owner[s_i] == j) & ~is_local
            if not m.any():
                continue
            # position of each sender in need[i][j] (sorted unique)
            pos = np.searchsorted(need[i][j], local_of[s_i[m]])
            local_senders[m] = n_loc_pad + j * halo_pad + pos
        # sort by receiver for segment_sum's sorted fast path
        order = np.argsort(local_of[r_i], kind="stable")
        cnt = len(s_i)
        s_out[i, :cnt] = local_senders[order]
        r_out[i, :cnt] = local_of[r_i][order]
        loc_sorted = is_local[order]
        ss, rr = s_out[i, :cnt], r_out[i, :cnt]
        int_s.append(ss[loc_sorted])
        int_r.append(rr[loc_sorted])
        bnd_s.append(ss[~loc_sorted] - n_loc_pad)  # index into halo stack
        bnd_r.append(rr[~loc_sorted])

    ei_pad = _round_up(max(len(a) for a in int_s) or 1, 8)
    eb_pad = _round_up(max(len(a) for a in bnd_s) or 1, 8)
    int_s_out = np.zeros((D, ei_pad), dtype=np.int64)
    int_r_out = np.full((D, ei_pad), n_loc_pad, dtype=np.int64)
    bnd_s_out = np.zeros((D, eb_pad), dtype=np.int64)
    bnd_r_out = np.full((D, eb_pad), n_loc_pad, dtype=np.int64)
    for i in range(D):
        int_s_out[i, :len(int_s[i])] = int_s[i]
        int_r_out[i, :len(int_r[i])] = int_r[i]
        bnd_s_out[i, :len(bnd_s[i])] = bnd_s[i]
        bnd_r_out[i, :len(bnd_r[i])] = bnd_r[i]

    # degrees in shard order (true degrees of the full graph)
    in_deg = np.bincount(receivers, minlength=n_nodes).astype(np.float32)
    out_deg = np.bincount(senders, minlength=n_nodes).astype(np.float32)
    in_deg_sh = np.zeros((D, n_loc_pad), np.float32)
    out_deg_sh = np.zeros((D, n_loc_pad), np.float32)
    for d, p in enumerate(parts):
        in_deg_sh[d, :len(p)] = in_deg[p]
        out_deg_sh[d, :len(p)] = out_deg[p]

    return ShardedGraph(
        senders=jnp.asarray(s_out, jnp.int32),
        receivers=jnp.asarray(r_out, jnp.int32),
        send_idx=jnp.asarray(send_idx, jnp.int32),
        in_degrees=jnp.asarray(in_deg_sh),
        out_degrees=jnp.asarray(out_deg_sh),
        node_perm=jnp.asarray(perm, jnp.int32),
        int_senders=jnp.asarray(int_s_out, jnp.int32),
        int_receivers=jnp.asarray(int_r_out, jnp.int32),
        bnd_senders=jnp.asarray(bnd_s_out, jnp.int32),
        bnd_receivers=jnp.asarray(bnd_r_out, jnp.int32),
        n_nodes=n_nodes, n_devices=D, n_loc_pad=n_loc_pad,
        halo_pad=halo_pad, n_edges=int(senders.shape[0]))


def shard_features(sg: ShardedGraph, x, mesh: Mesh):
    """Permute+pad node features into shard order and place them sharded
    over the ``graph`` axis: (D * n_loc_pad, F)."""
    x = np.asarray(x)
    out = np.zeros((sg.total_rows, x.shape[1]), x.dtype)
    out[np.asarray(sg.node_perm)] = x
    return jax.device_put(jnp.asarray(out),
                          NamedSharding(mesh, P("graph", None)))


def unshard(sg: ShardedGraph, y) -> jnp.ndarray:
    """Back to original node order: (N, F)."""
    return jnp.take(y, sg.node_perm, axis=0)


def _local_agg(sg: ShardedGraph, x_loc, send_idx_me, senders, receivers):
    """Per-device body: halo exchange + local SpMM.  Runs inside
    shard_map; all args have their leading device axis stripped."""
    D, H = sg.n_devices, sg.halo_pad
    f = x_loc.shape[-1]
    send = jnp.take(x_loc, send_idx_me.reshape(-1), axis=0)
    send = send.reshape(D, H, f)
    halo = jax.lax.all_to_all(send, "graph", split_axis=0, concat_axis=0)
    full = jnp.concatenate([x_loc, halo.reshape(D * H, f)], axis=0)
    msgs = jnp.take(full, senders, axis=0)
    return jax.ops.segment_sum(msgs, receivers,
                               num_segments=sg.n_loc_pad,
                               indices_are_sorted=True)


def _local_agg_overlapped(sg: ShardedGraph, x_loc, send_idx_me,
                          int_senders, int_receivers,
                          bnd_senders, bnd_receivers):
    """Same result as :func:`_local_agg`, but the interior-edge SpMM is
    data-independent of the all_to_all, so XLA's latency-hiding
    scheduler can run it while the halo is on the wire; only the (much
    smaller) boundary-edge SpMM waits for the collective."""
    D, H = sg.n_devices, sg.halo_pad
    f = x_loc.shape[-1]
    send = jnp.take(x_loc, send_idx_me.reshape(-1), axis=0)
    send = send.reshape(D, H, f)
    halo = jax.lax.all_to_all(send, "graph", split_axis=0, concat_axis=0)
    interior = jax.ops.segment_sum(
        jnp.take(x_loc, int_senders, axis=0), int_receivers,
        num_segments=sg.n_loc_pad, indices_are_sorted=True)
    boundary = jax.ops.segment_sum(
        jnp.take(halo.reshape(D * H, f), bnd_senders, axis=0),
        bnd_receivers, num_segments=sg.n_loc_pad,
        indices_are_sorted=True)
    return interior + boundary


def sharded_aggregate(sg: ShardedGraph, mesh: Mesh,
                      overlapped: bool = True):
    """Returns jitted ``agg(x_sharded) -> y_sharded`` ((D*n_loc_pad, F)
    in, same out), the distributed ``out[r] = sum x[s]``.
    ``overlapped`` uses the interior/boundary edge split so the halo
    collective hides behind the interior SpMM."""

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("graph", None), P("graph"), P("graph"), P("graph")),
             out_specs=P("graph", None),
             check_vma=False)
    def agg(x_loc, send_idx, senders, receivers):
        return _local_agg(sg, x_loc, send_idx[0], senders[0], receivers[0])

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("graph", None), P("graph"), P("graph"), P("graph"),
                       P("graph"), P("graph")),
             out_specs=P("graph", None),
             check_vma=False)
    def agg_ov(x_loc, send_idx, int_s, int_r, bnd_s, bnd_r):
        return _local_agg_overlapped(sg, x_loc, send_idx[0], int_s[0],
                                     int_r[0], bnd_s[0], bnd_r[0])

    if overlapped:
        def run(x_sharded):
            return agg_ov(x_sharded, sg.send_idx, sg.int_senders,
                          sg.int_receivers, sg.bnd_senders,
                          sg.bnd_receivers)
    else:
        def run(x_sharded):
            return agg(x_sharded, sg.send_idx, sg.senders, sg.receivers)

    return jax.jit(run)
