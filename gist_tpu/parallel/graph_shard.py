"""Edge-partitioned multi-chip SpMM with boundary halo exchange.

One graph's nodes are partitioned across the ``graph`` mesh axis
(locality-preserving partitioner → fewer cut edges → smaller halos);
each device owns a contiguous relabeled node range, its nodes'
features, and all edges whose *receiver* it owns.  Aggregation:

  1. every device gathers the boundary rows its peers need
     (``ring_send_idx``, precomputed host-side);
  2. the halo moves over the mesh axis — by default a ``ppermute``
     *ring*: D-1 shifts, each padded only to that shift's own max halo
     (locality-ordered partitions put most cut edges on adjacent
     shards, so far shifts are nearly empty and the wire carries ~the
     ideal volume; the round-1 ``all_to_all`` padded every (i,j) block
     to the GLOBAL max and shipped a useless self-block);
  3. local SpMM over ``[x_local ; halo]`` with pre-remapped sender
     indices — no further communication.  Interior edges don't depend
     on the collective, so their SpMM hides the wire latency.

``ShardedGraph.comm_stats`` reports ideal vs on-wire rows for both
layouts (the ≥80% scaling-efficiency north star needs the accounting,
BASELINE.md).  Host-side build is vectorized (one sort over cross
edges), not the O(D²) per-pair ``np.unique`` loop of round 1.

Reference contrast: every rank holds the whole graph and exchanges
nothing (ist_distrib.py:482-517) — this module is the framework's new
scaling axis.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gist_tpu.graph import DedupTiles


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class ShardedGraph:
    """All arrays carry a leading (D,) device axis, sharded over the
    ``graph`` mesh axis by the caller.  Sender indices address the
    per-device ``[x_local (n_loc_pad) ; halo]`` stack; the halo layout
    depends on the exchange (ring: concat of per-shift blocks;
    all_to_all: D blocks of halo_pad)."""

    senders: jnp.ndarray      # (D, E_pad) int32 (a2a halo layout)
    receivers: jnp.ndarray    # (D, E_pad) int32; padding == n_loc_pad
    send_idx: jnp.ndarray     # (D, D, halo_pad) int32 rows to send (a2a)
    ring_send_idx: Tuple[jnp.ndarray, ...]  # per kept shift: (D, pad_k)
    in_degrees: jnp.ndarray   # (D, n_loc_pad) float32 (true degree)
    out_degrees: jnp.ndarray  # (D, n_loc_pad) float32
    node_perm: jnp.ndarray    # (N,) original -> shard order
    # interior/boundary split of the same edges (for overlapping the
    # halo exchange with the interior SpMM): interior senders index
    # x_local; boundary senders index the halo (layout per variant)
    int_senders: jnp.ndarray  # (D, Ei_pad)
    int_receivers: jnp.ndarray
    bnd_senders: jnp.ndarray       # (D, Eb_pad) — a2a halo positions
    bnd_receivers: jnp.ndarray
    ring_bnd_senders: jnp.ndarray  # (D, Eb_pad) — ring halo positions
    n_nodes: int = struct.field(pytree_node=False)      # original N
    n_devices: int = struct.field(pytree_node=False)
    n_loc_pad: int = struct.field(pytree_node=False)
    halo_pad: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)
    ideal_halo_rows: int = struct.field(pytree_node=False)
    # shifts with at least one needed row (empty shifts ship nothing)
    ring_shifts: Tuple[int, ...] = struct.field(pytree_node=False,
                                                default=())
    # Per-shard Pallas dedup layouts over the INTERIOR edges (leaves
    # carry a leading (D,) device axis, padded to common shapes): the
    # interior SpMM — the bulk of every sharded aggregation — then runs
    # on the block-dense dedup kernel instead of XLA segment_sum
    # (measured 10x slower end-to-end, PERF.md).  Boundary edges stay
    # on segment_sum (small by construction).  None when built on a
    # segment-only backend (CPU tests / dry runs).
    int_dedup: Optional[DedupTiles] = None
    int_dedup_t: Optional[DedupTiles] = None
    # (D, n_loc_pad) float32: 1.0 on real rows, 0.0 on padding — global
    # reductions over node rows (masked loss, the GCN whole-tensor
    # LayerNorm) must exclude padded rows.  None on graphs built before
    # the field existed.
    row_valid: Optional[jnp.ndarray] = None

    @property
    def total_rows(self) -> int:
        return self.n_devices * self.n_loc_pad

    @property
    def ring_pads(self) -> Tuple[int, ...]:
        return tuple(int(a.shape[1]) for a in self.ring_send_idx)

    def comm_stats(self, f: int = 1, itemsize: int = 4) -> dict:
        """Rows/bytes on the wire per aggregation vs the ideal (each
        needed boundary row moved exactly once)."""
        D = self.n_devices
        ideal = self.ideal_halo_rows
        ring_rows = D * sum(self.ring_pads)
        a2a_rows = D * D * self.halo_pad
        row_b = f * itemsize
        return {
            "ideal_rows": ideal,
            "ring_rows": ring_rows,
            "a2a_rows": a2a_rows,
            "ring_waste": ring_rows / max(ideal, 1),
            "a2a_waste": a2a_rows / max(ideal, 1),
            "ideal_bytes": ideal * row_b,
            "ring_bytes": ring_rows * row_b,
            "a2a_bytes": a2a_rows * row_b,
        }

    def projected_scaling(self, t1_agg_s: float, f: int,
                          itemsize: int = 4,
                          ici_bytes_per_s: float = 4.5e10,
                          halo_itemsize: Optional[int] = None) -> dict:
        """Project the D-chip edges/s scaling efficiency of one SpMM
        aggregation from a measured single-chip time (the ≥80%
        north-star number, BASELINE.md; single-chip times come from
        bench.py / PERF.md).

        Model: the overlapped variants of ``sharded_aggregate`` hide
        the ring halo exchange behind the interior-edge aggregation, so
        the slowest device's step is
        ``max(t_interior, t_wire) + t_boundary``; the no-overlap serial
        bound ``t_compute + t_wire`` is reported alongside.  Compute
        scales with the slowest device's edge share (shards are
        balanced by node count, not edge count); the wire term is the
        rows each device sends per ring shift at one ICI link's
        bandwidth (~45 GB/s/direction on v5e).  Latency per shift is
        ignored — halo payloads here are MB-scale.

        ``halo_itemsize`` (default = ``itemsize``) models
        ``sharded_aggregate(halo_dtype=...)``: bf16-on-the-wire at fp32
        compute passes ``itemsize=4, halo_itemsize=2``.
        """
        h_item = itemsize if halo_itemsize is None else halo_itemsize
        D = self.n_devices
        E = max(self.n_edges, 1)
        recv = np.asarray(self.receivers)
        edges_dev = (recv < self.n_loc_pad).sum(axis=1)       # (D,)
        bnd = np.asarray(self.bnd_receivers)
        bnd_dev = (bnd < self.n_loc_pad).sum(axis=1)
        worst = int(edges_dev.argmax())
        t_edge = t1_agg_s / E                               # s per edge
        t_comp = float(edges_dev[worst]) * t_edge
        t_bnd = float(bnd_dev[worst]) * t_edge
        t_int = t_comp - t_bnd
        wire_rows = sum(self.ring_pads)       # rows sent per device
        t_wire = wire_rows * f * h_item / ici_bytes_per_s
        t_overlap = max(t_int, t_wire) + t_bnd
        t_serial = t_comp + t_wire
        ideal = t1_agg_s / D
        return {
            "n_devices": D,
            "edges_per_device_max": int(edges_dev.max()),
            "edges_per_device_mean": float(edges_dev.mean()),
            "edge_balance": float(edges_dev.max() * D / E),
            "wire_rows_per_device": int(wire_rows),
            "wire_bytes_per_device": int(wire_rows * f * h_item),
            "t_compute_s": t_comp,
            "t_wire_s": t_wire,
            "t_step_overlap_s": t_overlap,
            "t_step_serial_s": t_serial,
            "efficiency_overlap": ideal / t_overlap,
            "efficiency_serial": ideal / t_serial,
            "speedup_overlap": t1_agg_s / t_overlap,
        }


def _chain_order_parts(senders, receivers, n_nodes,
                       parts: List[np.ndarray]) -> List[np.ndarray]:
    """Renumber parts so heavily-communicating pairs get nearby device
    ids (nearest-neighbor chain over the inter-part edge-count graph).
    The ring exchange pads per SHIFT, so concentrating halo weight on
    small |i-j| makes far shifts empty and droppable."""
    D = len(parts)
    if D <= 2:
        return parts
    owner = np.empty(n_nodes, dtype=np.int64)
    for d, p in enumerate(parts):
        owner[p] = d
    so, ro = owner[np.asarray(senders)], owner[np.asarray(receivers)]
    cross = so != ro
    C = np.bincount(ro[cross] * D + so[cross], minlength=D * D) \
        .reshape(D, D).astype(np.int64)
    C = C + C.T
    # start from the weakest-connected part (an "end" of the chain)
    order = [int(np.argmin(C.sum(1)))]
    seen = {order[0]}
    while len(order) < D:
        last = order[-1]
        cand = [(int(C[last, j]), -j) for j in range(D) if j not in seen]
        best = -max(cand)[1]
        order.append(best)
        seen.add(best)
    return [parts[j] for j in order]


def _build_interior_tiles(int_s: List[np.ndarray], int_r: List[np.ndarray],
                          n_loc_pad: int, seed: int):
    """Per-shard DedupTiles over the (unpadded) interior edge lists,
    padded to common shapes and stacked on a leading (D,) device axis
    so they ride through shard_map.  Returns (fwd, transpose) or
    (None, None) when any shard's layout build bails."""
    from gist_tpu.graph import _build_dedup_tiles, pad_dedup_tiles

    fwd, bwd = [], []
    for s, r in zip(int_s, int_r):
        d = _build_dedup_tiles(s, r, n_loc_pad, seed=seed, as_numpy=True)
        # transpose aggregates out[s] += g[r]
        d_t = None if d is None else _build_dedup_tiles(
            r, s, n_loc_pad, seed=seed, as_numpy=True)
        if d is None or d_t is None:
            return None, None
        fwd.append(d)
        bwd.append(d_t)

    def unify_stack(tiles):
        jb = max(int(t.w_blocks.shape[0]) for t in tiles)
        mj = max(t.max_jobs for t in tiles)
        tiles = [pad_dedup_tiles(t, jb, mj, as_numpy=True) for t in tiles]
        # pos is None when a shard is too small for the locality
        # reorder; normalize to identity so the leaves stack
        if any(t.pos is not None for t in tiles):
            ident = np.arange(n_loc_pad, dtype=np.int32)
            tiles = [t if t.pos is not None else t.replace(pos=ident)
                     for t in tiles]
        return jax.tree.map(
            lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])),
            *tiles)

    return unify_stack(fwd), unify_stack(bwd)


def build_sharded_graph(senders, receivers, n_nodes: int, n_devices: int,
                        *, parts: Optional[List[np.ndarray]] = None,
                        seed: int = 0,
                        interior_tiles: Optional[bool] = None,
                        ) -> ShardedGraph:
    """Host-side preprocessing.  ``parts`` (optional) is a list of
    n_devices disjoint node-id arrays; defaults to the refined
    multilevel partitioner.

    ``interior_tiles=None`` (auto) builds per-shard Pallas dedup
    layouts for the interior edges when a pallas-capable backend is
    active (``ops.spmm.tiles_wanted``), so the sharded aggregation's
    dominant term runs on the kernel; CPU tests / dry runs stay on the
    segment path."""
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    D = n_devices
    if parts is None:
        from gist_tpu.partition import get_partition_list
        parts = get_partition_list(senders, receivers, n_nodes, D, seed=seed)
    assert len(parts) == D
    parts = _chain_order_parts(senders, receivers, n_nodes, parts)

    # relabel: device d owns new ids [d*n_loc_pad, d*n_loc_pad+len(parts[d]))
    n_loc_pad = _round_up(max(max(len(p) for p in parts), 1), 8)
    perm = np.full(n_nodes, -1, dtype=np.int64)       # old -> new
    owner = np.empty(n_nodes, dtype=np.int64)
    local_of = np.empty(n_nodes, dtype=np.int64)
    for d, p in enumerate(parts):
        perm[p] = d * n_loc_pad + np.arange(len(p))
        owner[p] = d
        local_of[p] = np.arange(len(p))
    assert (perm >= 0).all(), "parts must cover all nodes"

    s_owner = owner[senders]
    e_owner = owner[receivers]
    cross = s_owner != e_owner

    # --- vectorized halo-need build: one sort over cross edges --------
    # key = ((dst_dev * D) + src_dev) * n_loc_pad + src_local
    ckey = ((e_owner[cross] * D + s_owner[cross]) * n_loc_pad
            + local_of[senders[cross]])
    uniq = np.unique(ckey)                       # sorted
    u_pair = uniq // n_loc_pad                   # dst*D + src
    u_local = uniq % n_loc_pad
    pair_start = np.searchsorted(u_pair, np.arange(D * D))
    pair_end = np.searchsorted(u_pair, np.arange(D * D), side="right")
    pair_cnt = (pair_end - pair_start).reshape(D, D)   # [i, j] = |need i<-j|
    ideal_halo_rows = int(len(uniq))

    # position of every cross edge's sender within its pair's need list
    e_upos = np.searchsorted(uniq, ckey)
    e_pair_pos = e_upos - pair_start[ckey // n_loc_pad]

    # a2a layout: per-pair blocks all padded to the global max
    halo_pad = _round_up(max(int(pair_cnt.max()), 1), 8)
    send_idx = np.zeros((D, D, halo_pad), dtype=np.int64)
    for i in range(D):
        for j in range(D):
            a, b = pair_start[i * D + j], pair_end[i * D + j]
            send_idx[j, i, :b - a] = u_local[a:b]

    # ring layout: shift k moves need[(j+k)%D <- j]; pad per shift to
    # its own exact max; shifts with no needed rows are dropped entirely
    ring_shifts = []
    ring_send = []
    ring_off = np.zeros(D, dtype=np.int64)       # halo offset by shift k
    acc = 0
    for k in range(1, D):
        pk = max(int(pair_cnt[(j + k) % D, j]) for j in range(D))
        if pk == 0:
            continue
        blk = np.zeros((D, pk), dtype=np.int64)
        for j in range(D):
            i = (j + k) % D
            a, b = pair_start[i * D + j], pair_end[i * D + j]
            blk[j, :b - a] = u_local[a:b]
        ring_shifts.append(k)
        ring_send.append(blk)
        ring_off[k] = acc
        acc += pk

    # --- per-device edge lists with remapped senders ------------------
    e_local = np.where(cross, -1, local_of[senders])
    # halo positions for cross edges, both layouts
    src_j = s_owner
    a2a_halo_pos = np.zeros(len(senders), dtype=np.int64)
    ring_halo_pos = np.zeros(len(senders), dtype=np.int64)
    if cross.any():
        cj = src_j[cross]
        ci = e_owner[cross]
        a2a_halo_pos[cross] = cj * halo_pad + e_pair_pos
        kshift = (ci - cj) % D
        ring_halo_pos[cross] = ring_off[kshift] + e_pair_pos

    e_pad = _round_up(max(int((e_owner == i).sum()) for i in range(D)) or 1,
                      8)
    s_out = np.zeros((D, e_pad), dtype=np.int64)
    r_out = np.full((D, e_pad), n_loc_pad, dtype=np.int64)
    int_s, int_r, bnd_s, bnd_r, rbnd_s = [], [], [], [], []
    for i in range(D):
        mask_i = e_owner == i
        r_i = local_of[receivers[mask_i]]
        is_local = ~cross[mask_i]
        loc_senders = np.where(is_local, e_local[mask_i],
                               n_loc_pad + a2a_halo_pos[mask_i])
        # sort by receiver for segment_sum's sorted fast path
        order = np.argsort(r_i, kind="stable")
        cnt = int(mask_i.sum())
        s_out[i, :cnt] = loc_senders[order]
        r_out[i, :cnt] = r_i[order]
        loc_sorted = is_local[order]
        int_s.append(e_local[mask_i][order][loc_sorted])
        int_r.append(r_i[order][loc_sorted])
        bnd_s.append(a2a_halo_pos[mask_i][order][~loc_sorted])
        bnd_r.append(r_i[order][~loc_sorted])
        rbnd_s.append(ring_halo_pos[mask_i][order][~loc_sorted])

    ei_pad = _round_up(max(len(a) for a in int_s) or 1, 8)
    eb_pad = _round_up(max(len(a) for a in bnd_s) or 1, 8)
    int_s_out = np.zeros((D, ei_pad), dtype=np.int64)
    int_r_out = np.full((D, ei_pad), n_loc_pad, dtype=np.int64)
    bnd_s_out = np.zeros((D, eb_pad), dtype=np.int64)
    bnd_r_out = np.full((D, eb_pad), n_loc_pad, dtype=np.int64)
    rbnd_s_out = np.zeros((D, eb_pad), dtype=np.int64)
    for i in range(D):
        int_s_out[i, :len(int_s[i])] = int_s[i]
        int_r_out[i, :len(int_r[i])] = int_r[i]
        bnd_s_out[i, :len(bnd_s[i])] = bnd_s[i]
        bnd_r_out[i, :len(bnd_r[i])] = bnd_r[i]
        rbnd_s_out[i, :len(rbnd_s[i])] = rbnd_s[i]

    # degrees in shard order (true degrees of the full graph)
    in_deg = np.bincount(receivers, minlength=n_nodes).astype(np.float32)
    out_deg = np.bincount(senders, minlength=n_nodes).astype(np.float32)
    in_deg_sh = np.zeros((D, n_loc_pad), np.float32)
    out_deg_sh = np.zeros((D, n_loc_pad), np.float32)
    row_valid = np.zeros((D, n_loc_pad), np.float32)
    for d, p in enumerate(parts):
        in_deg_sh[d, :len(p)] = in_deg[p]
        out_deg_sh[d, :len(p)] = out_deg[p]
        row_valid[d, :len(p)] = 1.0

    if interior_tiles is None:
        from gist_tpu.ops.spmm import tiles_wanted
        interior_tiles = tiles_wanted()
    int_dedup = int_dedup_t = None
    if interior_tiles:
        int_dedup, int_dedup_t = _build_interior_tiles(
            int_s, int_r, n_loc_pad, seed)

    return ShardedGraph(
        int_dedup=int_dedup,
        int_dedup_t=int_dedup_t,
        senders=jnp.asarray(s_out, jnp.int32),
        receivers=jnp.asarray(r_out, jnp.int32),
        send_idx=jnp.asarray(send_idx, jnp.int32),
        ring_send_idx=tuple(jnp.asarray(b, jnp.int32) for b in ring_send),
        in_degrees=jnp.asarray(in_deg_sh),
        out_degrees=jnp.asarray(out_deg_sh),
        node_perm=jnp.asarray(perm, jnp.int32),
        int_senders=jnp.asarray(int_s_out, jnp.int32),
        int_receivers=jnp.asarray(int_r_out, jnp.int32),
        bnd_senders=jnp.asarray(bnd_s_out, jnp.int32),
        bnd_receivers=jnp.asarray(bnd_r_out, jnp.int32),
        ring_bnd_senders=jnp.asarray(rbnd_s_out, jnp.int32),
        n_nodes=n_nodes, n_devices=D, n_loc_pad=n_loc_pad,
        halo_pad=halo_pad, n_edges=int(senders.shape[0]),
        ideal_halo_rows=ideal_halo_rows,
        ring_shifts=tuple(ring_shifts),
        row_valid=jnp.asarray(row_valid))


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


def _ring_halo(sg: ShardedGraph, x_loc, ring_send_local,
               halo_dtype=None):
    """One ppermute per non-empty shift; returns the concatenated halo
    rows in shift order (matching ``ring_bnd_senders``).  Each shift's
    block is padded only to that shift's own max — locality-ordered
    partitions make far shifts empty (dropped host-side), so the wire
    carries near-ideal volume (vs every (i,j) block padded to the
    global max in the all_to_all layout).

    ``halo_dtype`` (e.g. ``jnp.bfloat16``) casts boundary rows for the
    wire only — halved ICI bytes at fp32 compute; rows are cast back
    before the boundary SpMM, so only halo (not interior) contributions
    see the rounding."""
    D = sg.n_devices
    blocks = []
    for k, send_idx in zip(sg.ring_shifts, ring_send_local):
        send = jnp.take(x_loc, send_idx, axis=0)
        if halo_dtype is not None:
            send = send.astype(halo_dtype)
        perm = [(j, (j + k) % D) for j in range(D)]
        blocks.append(jax.lax.ppermute(send, "graph", perm))
    if not blocks:
        return jnp.zeros((8, x_loc.shape[-1]), x_loc.dtype)
    return jnp.concatenate(blocks, axis=0).astype(x_loc.dtype)


def _local_agg(sg: ShardedGraph, x_loc, send_idx_me, senders, receivers):
    """Per-device body: all_to_all halo exchange + local SpMM (the
    simple variant kept for tests/reference).  Runs inside shard_map;
    args have their leading device axis stripped."""
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


@functools.lru_cache(maxsize=None)
def _dedup_agg_fn(n_rows: int):
    """Differentiable per-shard dedup-kernel aggregation: forward runs
    the block-dense Pallas SpMM on the interior tiles, backward on the
    transpose tiles — autodiff through the sharded step never touches
    XLA scatter (same custom_vjp shape as ops.pallas_spmm)."""
    from gist_tpu.ops.pallas_spmm import _run_dedup

    @jax.custom_vjp
    def agg(pair, x):
        return _run_dedup(pair[0], x, n_rows)

    def fwd(pair, x):
        return agg(pair, x), pair

    def bwd(pair, g):
        return None, _run_dedup(pair[1], g, n_rows)

    agg.defvjp(fwd, bwd)
    return agg


def ring_device_arrays(sg: ShardedGraph) -> dict:
    """The per-device array bundle the ring aggregation needs, passed
    through shard_map as one pytree with spec P("graph") (every leaf's
    leading device axis sharded)."""
    dev = {
        "ring_send": sg.ring_send_idx,
        "int_s": sg.int_senders, "int_r": sg.int_receivers,
        "bnd_s": sg.ring_bnd_senders, "bnd_r": sg.bnd_receivers,
    }
    if sg.int_dedup is not None:
        dev["int_dedup"] = sg.int_dedup
        dev["int_dedup_t"] = sg.int_dedup_t
    return dev


def _local_agg_ring(sg: ShardedGraph, x_loc, dev, halo_dtype=None):
    """Ring halo exchange + interior/boundary split: the interior-edge
    SpMM is data-independent of the ppermutes, so XLA's latency-hiding
    scheduler runs it while halos are on the wire; only the (much
    smaller) boundary-edge SpMM waits.  ``dev`` is the local slice of
    :func:`ring_device_arrays` (leading device axis stripped).  When
    the bundle carries interior dedup tiles, the interior SpMM runs on
    the Pallas block-dense kernel (fwd + bwd); boundary edges stay on
    segment_sum."""
    halo = _ring_halo(sg, x_loc, dev["ring_send"], halo_dtype)
    if "int_dedup" in dev:
        interior = _dedup_agg_fn(sg.n_loc_pad)(
            (dev["int_dedup"], dev["int_dedup_t"]), x_loc)
    else:
        interior = jax.ops.segment_sum(
            jnp.take(x_loc, dev["int_s"], axis=0), dev["int_r"],
            num_segments=sg.n_loc_pad, indices_are_sorted=True)
    boundary = jax.ops.segment_sum(
        jnp.take(halo, dev["bnd_s"], axis=0), dev["bnd_r"],
        num_segments=sg.n_loc_pad, indices_are_sorted=True)
    return interior + boundary


def sharded_aggregate(sg: ShardedGraph, mesh: Mesh,
                      overlapped: bool = True, ring: bool = True,
                      halo_dtype=None):
    """Returns jitted ``agg(x_sharded) -> y_sharded`` ((D*n_loc_pad, F)
    in, same out), the distributed ``out[r] = sum x[s]``.  Default is
    the ring exchange with the interior/boundary overlap; ``ring=False``
    uses the round-1 all_to_all layout (kept as a reference point).
    The ring layout is inherently overlapped (interior/boundary split),
    so ``overlapped=False`` always selects the plain serial all_to_all
    variant regardless of ``ring``.

    ``halo_dtype=jnp.bfloat16`` ships boundary rows over ICI in bf16
    while computing in the features' dtype — halves the wire term of
    :meth:`ShardedGraph.projected_scaling` for fp32 runs (only halo
    contributions see bf16 rounding; interior edges stay exact).
    Applies to the ring layout (the default path)."""

    if halo_dtype is not None and not (ring and overlapped):
        raise ValueError(
            "halo_dtype is implemented only by the ring+overlapped "
            "variant (the default); the all_to_all reference paths ship "
            "fp32 halos — pass ring=True, overlapped=True or drop "
            "halo_dtype")

    if ring and overlapped:
        # also the D=1 degenerate case: no shifts, interior == all
        # edges — proves the sharded plumbing costs ~the flat kernel
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P("graph", None), P("graph")),
                 out_specs=P("graph", None),
                 check_vma=False)
        def agg_ring(x_loc, dev):
            dev = jax.tree.map(lambda a: a[0], dev)
            return _local_agg_ring(sg, x_loc, dev, halo_dtype)

        # the device arrays enter the jit as runtime ARGUMENTS: closed
        # over they'd embed as HLO literals (100+ MB of tile layouts),
        # which breaks the remote-compile path (PERF.md)
        jit_agg = jax.jit(agg_ring)

        def run(x_sharded):
            return jit_agg(x_sharded, ring_device_arrays(sg))
        return run

    if overlapped and sg.n_devices > 1:
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P("graph", None), P("graph"), P("graph"),
                           P("graph"), P("graph"), P("graph")),
                 out_specs=P("graph", None),
                 check_vma=False)
        def agg_ov(x_loc, send_idx, int_s, int_r, bnd_s, bnd_r):
            D, H = sg.n_devices, sg.halo_pad
            f = x_loc.shape[-1]
            send = jnp.take(x_loc, send_idx[0].reshape(-1), axis=0)
            send = send.reshape(D, H, f)
            halo = jax.lax.all_to_all(send, "graph", split_axis=0,
                                      concat_axis=0)
            interior = jax.ops.segment_sum(
                jnp.take(x_loc, int_s[0], axis=0), int_r[0],
                num_segments=sg.n_loc_pad, indices_are_sorted=True)
            boundary = jax.ops.segment_sum(
                jnp.take(halo.reshape(D * H, f), bnd_s[0], axis=0),
                bnd_r[0], num_segments=sg.n_loc_pad,
                indices_are_sorted=True)
            return interior + boundary

        jit_ov = jax.jit(agg_ov)

        def run(x_sharded):
            return jit_ov(x_sharded, sg.send_idx, sg.int_senders,
                          sg.int_receivers, sg.bnd_senders,
                          sg.bnd_receivers)
        return run

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("graph", None), P("graph"), P("graph"),
                       P("graph")),
             out_specs=P("graph", None),
             check_vma=False)
    def agg(x_loc, send_idx, senders, receivers):
        return _local_agg(sg, x_loc, send_idx[0], senders[0], receivers[0])

    jit_plain = jax.jit(agg)

    def run(x_sharded):
        return jit_plain(x_sharded, sg.send_idx, sg.senders, sg.receivers)

    return run
