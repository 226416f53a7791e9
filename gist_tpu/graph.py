"""Static-shape graph container for TPU execution.

The reference carries graphs as DGL objects with native CSR kernels
behind them (e.g. ``update_all(fn.copy_src, fn.sum)`` in
cluster_gcn/modules.py:136-137).  On TPU everything under ``jit`` must
have static shapes, so a graph here is a plain pytree of padded arrays:

* ``senders[e]`` / ``receivers[e]`` — COO edge list sorted by receiver
  (destination).  Padding edges carry ``receivers == n_nodes`` so that
  ``jax.ops.segment_sum(..., num_segments=n_nodes)`` drops them for free.
* ``indptr`` — CSR row pointers over receivers, used by the Pallas SpMM
  kernel path.

``n_nodes`` is static (inferred from array shapes); the *actual* edge
count ``n_edges`` is static aux data so jit caches per padded bucket,
not per graph instance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class TiledCSR:
    """Tile-aligned CSR layout for the Pallas SpMM kernel.

    Mosaic requires 1-D i32 DMA slices to be 1024-element aligned (both
    offset and size), so every destination tile's edge segment is padded
    host-side to a multiple of ``chunk`` (= 1024).  Padding edges carry
    ``receivers == num_tiles * tile_rows`` (outside every tile's local
    row range, so the kernel's one-hot matrix zeroes them without
    masking).
    """

    senders: jnp.ndarray       # (E_t,) int32
    receivers: jnp.ndarray     # (E_t,) int32
    tile_offsets: jnp.ndarray  # (num_tiles + 1,) int32, multiples of chunk
    tile_rows: int = struct.field(pytree_node=False)   # TN
    chunk: int = struct.field(pytree_node=False)       # C (1024)
    max_chunks: int = struct.field(pytree_node=False)  # max per-tile chunks
    # position of each slot's edge in the *other* layout's tiled arrays
    # (forward <-> transpose), 0 for padding slots.  Lets per-edge values
    # computed in one layout be re-ordered into the other with a plain
    # gather (the fused GAT backward needs ds in both groupings).
    pos_in_other: Optional[jnp.ndarray] = None

    @property
    def num_tiles(self) -> int:
        return self.tile_offsets.shape[0] - 1


def _build_tiled_csr(senders_sorted: np.ndarray, receivers_sorted: np.ndarray,
                     indptr: np.ndarray, n_nodes: int,
                     tile_rows: int = 128, chunk: int = 1024) -> TiledCSR:
    """Host-side: re-lay receiver-sorted edges so each dst tile's segment
    starts at a chunk-aligned offset."""
    num_tiles = -(-n_nodes // tile_rows)
    bounds = np.minimum(np.arange(num_tiles + 1) * tile_rows, n_nodes)
    seg_starts = indptr[bounds[:-1]]
    seg_ends = indptr[bounds[1:]]
    seg_counts = seg_ends - seg_starts
    padded = np.maximum(_round_up_arr(seg_counts, chunk), 0)
    offsets = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(padded, out=offsets[1:])
    total = int(offsets[-1])

    sentinel = num_tiles * tile_rows
    s_out = np.zeros(total, dtype=np.int32)
    r_out = np.full(total, sentinel, dtype=np.int32)
    dst = None
    # vectorized segment copy: destination index for each real edge
    if len(senders_sorted):
        tile_of_edge = np.repeat(np.arange(num_tiles), seg_counts)
        within = np.arange(len(senders_sorted)) - seg_starts[tile_of_edge]
        dst = offsets[:-1][tile_of_edge] + within
        s_out[dst] = senders_sorted
        r_out[dst] = receivers_sorted
    tiled = TiledCSR(
        senders=jnp.asarray(s_out), receivers=jnp.asarray(r_out),
        tile_offsets=jnp.asarray(offsets, dtype=jnp.int32),
        tile_rows=tile_rows, chunk=chunk,
        max_chunks=int(padded.max() // chunk) if num_tiles else 0)
    return tiled, dst


def _link_tiled_pair(fwd: TiledCSR, fwd_dst, t: TiledCSR, t_dst,
                     t_order: np.ndarray, n_edges: int):
    """Fill ``pos_in_other`` on a forward/transpose TiledCSR pair.

    ``fwd_dst[k]`` is the fwd-tiled position of the k-th receiver-sorted
    edge (the canonical id space); ``t_dst[k]`` the transpose-tiled
    position of the k-th sender-sorted edge, whose canonical id is
    ``t_order[k]``."""
    if n_edges == 0 or fwd_dst is None or t_dst is None:
        return fwd, t
    pos_f = np.asarray(fwd_dst, dtype=np.int64)            # canon -> fwd pos
    pos_t = np.zeros(n_edges, dtype=np.int64)              # canon -> t pos
    pos_t[np.asarray(t_order, dtype=np.int64)] = np.asarray(t_dst,
                                                            dtype=np.int64)
    f_other = np.zeros(int(fwd.senders.shape[0]), dtype=np.int64)
    f_other[pos_f] = pos_t
    t_other = np.zeros(int(t.senders.shape[0]), dtype=np.int64)
    t_other[pos_t] = pos_f
    return (fwd.replace(pos_in_other=jnp.asarray(f_other, jnp.int32)),
            t.replace(pos_in_other=jnp.asarray(t_other, jnp.int32)))


def _round_up_arr(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


def pad_tiled_csr(t: TiledCSR, e_to: int, max_chunks_to: int,
                  as_numpy: bool = False) -> TiledCSR:
    """Pad a v1 TiledCSR layout to a bucketed edge-slot count /
    max_chunks so cluster batches in one size bucket share a jit cache
    entry (the gather-layout analog of :func:`pad_dedup_tiles`).
    Padding slots carry the sentinel receiver (outside every tile's
    local range) and live past ``tile_offsets[-1]``, so the kernel's
    clamped chunk indices never read them."""
    s = np.asarray(t.senders)
    r = np.asarray(t.receivers)
    e_to = max(_round_up(e_to, t.chunk), len(s))
    extra = e_to - len(s)
    pio = None if t.pos_in_other is None else np.asarray(t.pos_in_other)
    if extra:
        sentinel = t.num_tiles * t.tile_rows
        s = np.concatenate([s, np.zeros(extra, np.int32)])
        r = np.concatenate([r, np.full(extra, sentinel, np.int32)])
        if pio is not None:
            pio = np.concatenate([pio, np.zeros(extra, np.int32)])
    conv = np.asarray if as_numpy else jnp.asarray
    return t.replace(
        senders=conv(s), receivers=conv(r),
        pos_in_other=None if pio is None else conv(pio),
        max_chunks=max(t.max_chunks, max_chunks_to))


@struct.dataclass
class DedupTiles:
    """Block-dense dedup layout for the Pallas SpMM kernel v2.

    Round 1's kernel materialized one gathered message row *per edge*
    (3x E*F HBM traffic).  Here each destination tile lists its *unique*
    senders once (``u_senders``), and the local adjacency becomes small
    dense count blocks ``w_blocks[j] : (TN, CU) int8`` pairing with the
    j-th CU-row block of gathered unique rows — the aggregation is then
    ``acc += W @ u`` on the MXU, no scatter and no per-edge gather.
    Traffic drops to ~d * (3 E F) where d = |unique|/E, which cluster
    ordering pushes to ~0.35 on Reddit-shaped graphs (hence ``pos``:
    nodes are relabeled by a locality partition; ``pos[v]`` is node v's
    row in kernel output order).
    """

    u_senders: jnp.ndarray    # (U_pad,) int32 — x row per slot (see perm)
    w_blocks: jnp.ndarray     # (J, TN, CU) int8 — per-job count blocks
    job_offsets: jnp.ndarray  # (num_tiles+1,) int32 — job index per tile
    pos: Optional[jnp.ndarray]  # (N,) int32 node->output row, or None (id)
    # (N,) int32 output row -> node, or None.  When set, u_senders hold
    # PERMUTED ids: runners first reorder x once (x_p = x[perm]) so each
    # tile's gather indices are sorted and cluster-local — at large N a
    # raw-id gather is random access over the whole feature table and
    # runs latency-bound (measured 10x slower than streaming).
    perm: Optional[jnp.ndarray]
    tile_rows: int = struct.field(pytree_node=False)   # TN
    cu: int = struct.field(pytree_node=False)          # CU (u rows / block)
    max_jobs: int = struct.field(pytree_node=False)

    @property
    def num_tiles(self) -> int:
        return self.job_offsets.shape[0] - 1


def _locality_order(senders: np.ndarray, receivers: np.ndarray,
                    n_nodes: int, tile_rows: int, seed: int = 0):
    """Tile-sized cluster ordering (refined multilevel partition) so a
    dst tile's senders are maximally repeated; returns (perm, pos)."""
    psize = max(2, -(-n_nodes // tile_rows))
    from gist_tpu.partition import get_partition_list
    parts = get_partition_list(senders, receivers, n_nodes, psize, seed=seed)
    perm = np.concatenate([p for p in parts if len(p)])
    pos = np.empty(n_nodes, dtype=np.int64)
    pos[perm] = np.arange(n_nodes)
    return perm, pos


@struct.dataclass
class ChunkedDedupTiles:
    """The v2 block-dense dedup layout, split into uniform tile chunks
    for graphs whose gathered-unique-rows intermediate (or W blocks)
    would not fit HBM in one shot (Amazon2M scale: ~50M unique rows x F
    floats).  Every chunk covers ``tiles_per_chunk`` destination tiles
    and is padded to the same job count, so one compiled kernel shape
    serves all chunks; the runner gathers and aggregates chunk by
    chunk, bounding live intermediate memory to one chunk's rows while
    W and the features stay resident."""

    u_senders: jnp.ndarray    # (n_chunks, jobs_pad * CU) int32
    w_blocks: jnp.ndarray     # (n_chunks, jobs_pad, TN, CU) int8
    job_offsets: jnp.ndarray  # (n_chunks, tiles_per_chunk + 1) int32 rebased
    pos: Optional[jnp.ndarray]  # (N,) int32 node -> output row, or None
    perm: Optional[jnp.ndarray]  # (N,) int32 row -> node (see DedupTiles)
    # --- split layout (round 3): dense (tile, source-block) pairs are
    # "direct" jobs whose CU-row source block streams straight from the
    # resident permuted feature table (NO gather op — the round-2 wall
    # was the ~85M rows/s XLA gather rate, PERF.md); sparse pairs stay
    # gathered unique slots.  When these fields are set, ``u_senders``
    # holds ONLY the remote slots ((n_chunks, rem_pad * CU)) and the
    # kernel selects per job via ``is_dir``.
    dir_blk: Optional[jnp.ndarray] = None  # (n_chunks, jobs_pad) int32
    rem_blk: Optional[jnp.ndarray] = None  # (n_chunks, jobs_pad) int32
    is_dir: Optional[jnp.ndarray] = None   # (n_chunks, jobs_pad) int32
    tile_rows: int = struct.field(pytree_node=False, default=64)
    cu: int = struct.field(pytree_node=False, default=1024)
    max_jobs: int = struct.field(pytree_node=False, default=0)  # per tile
    num_tiles: int = struct.field(pytree_node=False, default=0)

    @property
    def n_chunks(self) -> int:
        return self.w_blocks.shape[0]

    @property
    def tiles_per_chunk(self) -> int:
        return self.job_offsets.shape[1] - 1

    def to_device(self) -> "ChunkedDedupTiles":
        """Copy with jnp leaves.  The builder returns numpy (so layout
        caching / CPU-side consumers don't pay a device round trip),
        but a long-lived Graph must hold device arrays — numpy leaves
        re-transfer GiB-scale W on every jitted call."""
        conv = lambda a: None if a is None else jnp.asarray(a)  # noqa: E731
        return self.replace(
            u_senders=jnp.asarray(self.u_senders),
            w_blocks=jnp.asarray(self.w_blocks),
            job_offsets=jnp.asarray(self.job_offsets),
            pos=conv(self.pos), perm=conv(self.perm),
            dir_blk=conv(self.dir_blk), rem_blk=conv(self.rem_blk),
            is_dir=conv(self.is_dir))


def pad_dedup_tiles(d: DedupTiles, jobs_to: int, max_jobs_to: int,
                    as_numpy: bool = False) -> DedupTiles:
    """Pad a DedupTiles layout to a bucketed job count so cluster
    batches in one size bucket share a jit cache entry.  Padding jobs
    are never indexed (``job_offsets`` is untouched and the kernel
    clamps); a larger ``max_jobs`` only adds skipped grid steps."""
    w = np.asarray(d.w_blocks)
    u = np.asarray(d.u_senders)
    jobs_to = max(jobs_to, w.shape[0])
    extra = jobs_to - w.shape[0]
    if extra:
        w = np.concatenate(
            [w, np.zeros((extra, d.tile_rows, d.cu), np.int8)], axis=0)
        u = np.concatenate([u, np.zeros(extra * d.cu, np.int32)])
    conv = np.asarray if as_numpy else jnp.asarray
    return d.replace(w_blocks=conv(w), u_senders=conv(u),
                     max_jobs=max(d.max_jobs, max_jobs_to))


def _dedup_tile_scan(senders: np.ndarray, receivers: np.ndarray,
                     n_nodes: int, tile_rows: int, cu: int,
                     reorder: bool, seed: int, permute_u: bool = False):
    """Shared host-side build for the dedup layouts: per destination
    tile, the padded unique-sender list and int8 count blocks —
    fully vectorized (one global sort over (tile, sender) pairs; the
    per-tile np.unique loop took 30+ min at 125M edges).
    Returns (u_flat, w_flat, job_offsets, pos, perm) or None on int8
    count overflow (extreme multigraph).

    ``permute_u``: emit unique-sender ids in the locality-permuted
    space (runners then reorder x once per call, making per-tile
    gather indices sorted and cluster-local).  Measured NEUTRAL at
    Amazon2M scale — the XLA gather is op-rate-bound, not
    locality-bound (PERF.md) — and a small per-call cost at benchmark
    scale, so only the chunked layout keeps it (where the permute is
    noise and the sorted ids help the planned window-split kernel)."""
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    pos = perm = None
    if reorder and n_nodes > 2 * tile_rows:
        order_perm, pos = _locality_order(senders, receivers, n_nodes,
                                          tile_rows, seed=seed)
        r = pos[receivers]
        if permute_u:
            perm = order_perm
            senders = pos[senders]
    else:
        r = receivers
    if len(senders) == 0:
        return None
    num_tiles = -(-n_nodes // tile_rows)
    tile_of = r // tile_rows

    # one global unique over (tile, sender) pairs
    k = tile_of * n_nodes + senders
    uk, inv_all = np.unique(k, return_inverse=True)
    u_tile = (uk // n_nodes).astype(np.int64)
    u_node = (uk % n_nodes).astype(np.int64)
    u_cnt = np.bincount(u_tile, minlength=num_tiles)        # U_t per tile
    u_start = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(u_cnt, out=u_start[1:])
    jobs_per_tile = -(-u_cnt // cu)
    job_offsets = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(jobs_per_tile, out=job_offsets[1:])
    total_jobs = int(job_offsets[-1])
    if total_jobs == 0:
        return None

    # scatter unique sender ids into the cu-padded flat u array
    pos_in_tile = np.arange(len(uk), dtype=np.int64) - u_start[u_tile]
    u_slot = ((job_offsets[u_tile] + pos_in_tile // cu) * cu
              + pos_in_tile % cu)
    u_flat = np.zeros(total_jobs * cu, dtype=np.int32)
    u_flat[u_slot] = u_node

    # per-edge W flat index -> run-length-encoded counts
    local_row = r - tile_of * tile_rows
    e_upos = pos_in_tile[inv_all]                 # edge's u index in tile
    w_idx = (((job_offsets[tile_of] + e_upos // cu) * tile_rows
              + local_row) * cu + e_upos % cu)
    del k, inv_all, e_upos, local_row
    w_idx.sort(kind="stable")
    boundary = np.empty(len(w_idx), dtype=bool)
    boundary[0] = True
    np.not_equal(w_idx[1:], w_idx[:-1], out=boundary[1:])
    starts = np.nonzero(boundary)[0]
    cnts = np.diff(np.append(starts, len(w_idx)))
    if cnts.max(initial=0) > 127:
        return None  # int8 count overflow
    w_flat = np.zeros(total_jobs * tile_rows * cu, dtype=np.int8)
    w_flat[w_idx[starts]] = cnts.astype(np.int8)
    w_flat = w_flat.reshape(total_jobs, tile_rows, cu)
    return u_flat, w_flat, job_offsets, pos, perm


def _build_dedup_tiles(senders: np.ndarray, receivers: np.ndarray,
                       n_nodes: int, *, tile_rows: int = 128, cu: int = 1024,
                       reorder: bool = True, seed: int = 0,
                       max_w_bytes: int = 512 * 2 ** 20,
                       as_numpy: bool = False,
                       ) -> Optional[DedupTiles]:
    """Host-side build of the v2 layout; returns None when the layout
    would be counterproductive (W blocks too large, count overflow)."""
    scan = _dedup_tile_scan(senders, receivers, n_nodes, tile_rows, cu,
                            reorder, seed)
    if scan is None:
        return None
    u_flat, w_flat, job_offsets, pos, perm = scan
    if w_flat.nbytes > max_w_bytes:
        return None
    max_jobs = int(np.diff(job_offsets).max())
    conv = np.asarray if as_numpy else jnp.asarray
    return DedupTiles(
        u_senders=conv(u_flat),
        w_blocks=conv(w_flat),
        job_offsets=conv(job_offsets.astype(np.int32)),
        pos=None if pos is None else conv(pos.astype(np.int32)),
        perm=None if perm is None else conv(perm.astype(np.int32)),
        tile_rows=tile_rows, cu=cu, max_jobs=max_jobs)


def _build_dedup_chunked(senders: np.ndarray, receivers: np.ndarray,
                         n_nodes: int, *, tile_rows: int = 128,
                         cu: int = 1024, reorder: bool = True, seed: int = 0,
                         chunk_rows: int = 4 * 2 ** 20,
                         ) -> Optional[ChunkedDedupTiles]:
    """Chunked v2 layout for huge graphs: tiles grouped into uniform
    chunks of ~``chunk_rows`` gathered unique rows each, all padded to
    one shape so a single compiled kernel serves every chunk."""
    scan = _dedup_tile_scan(senders, receivers, n_nodes, tile_rows, cu,
                            reorder, seed, permute_u=True)
    if scan is None:
        return None
    u_flat, w_flat, job_offsets, pos, perm = scan
    num_tiles = len(job_offsets) - 1
    jobs_per_tile = np.diff(job_offsets)
    target_jobs = max(1, chunk_rows // cu)
    mean_jobs = max(float(jobs_per_tile.mean()), 1e-9)
    tpc = max(1, min(num_tiles, int(target_jobs / mean_jobs)))
    n_chunks = -(-num_tiles // tpc)
    # per-chunk job spans (contiguous: jobs are laid out tile-major)
    chunk_lo = job_offsets[np.minimum(np.arange(n_chunks) * tpc, num_tiles)]
    chunk_hi = job_offsets[np.minimum((np.arange(n_chunks) + 1) * tpc,
                                      num_tiles)]
    jobs_pad = int((chunk_hi - chunk_lo).max())
    if jobs_pad == 0:
        return None

    w_out = np.zeros((n_chunks, jobs_pad, tile_rows, cu), dtype=np.int8)
    u_out = np.zeros((n_chunks, jobs_pad * cu), dtype=np.int32)
    offs_out = np.zeros((n_chunks, tpc + 1), dtype=np.int64)
    for c in range(n_chunks):
        lo, hi = int(chunk_lo[c]), int(chunk_hi[c])
        w_out[c, :hi - lo] = w_flat[lo:hi]
        u_out[c, :(hi - lo) * cu] = u_flat[lo * cu:hi * cu]
        t0, t1 = c * tpc, min((c + 1) * tpc, num_tiles)
        offs_out[c, :t1 - t0 + 1] = job_offsets[t0:t1 + 1] - lo
        offs_out[c, t1 - t0 + 1:] = offs_out[c, t1 - t0]  # padded tiles
    # leaves stay numpy: at Amazon2M scale W is GiB-sized and callers
    # (layout caching, CPU-side builds) shouldn't pay a device round
    # trip — jit device-puts them on first dispatch
    return ChunkedDedupTiles(
        u_senders=u_out,
        w_blocks=w_out,
        job_offsets=offs_out.astype(np.int32),
        pos=None if pos is None else pos.astype(np.int32),
        perm=None if perm is None else perm.astype(np.int32),
        tile_rows=tile_rows, cu=cu,
        max_jobs=int(jobs_per_tile.max()), num_tiles=num_tiles)


def _ffill(values: np.ndarray, has_value: np.ndarray,
           fill0: int = 0) -> np.ndarray:
    """Carry each marked value forward over unmarked positions (leading
    unmarked positions get ``fill0``)."""
    idx = np.where(has_value, np.arange(len(values)), -1)
    np.maximum.accumulate(idx, out=idx)
    out = np.where(idx >= 0, values[np.maximum(idx, 0)], fill0)
    return out


def _build_dedup_split_chunked(senders: np.ndarray, receivers: np.ndarray,
                               n_nodes: int, *, tile_rows: int = 64,
                               cu: int = 1024, threshold: int = 128,
                               chunk_rows: int = 4 * 2 ** 20, seed: int = 0,
                               ) -> Optional[ChunkedDedupTiles]:
    """Chunked dedup layout with the direct/remote split (round 3).

    The round-2 chunked kernel gathered EVERY unique (tile, sender)
    slot and was bound by the ~85M rows/s XLA gather op rate (PERF.md:
    955 of 1229 ms).  Here a (dst-tile, source-block) pair with
    ``>= threshold`` edges becomes a *direct* job: its W block pairs
    with the CU-row source block read straight from the resident
    permuted feature table by the kernel's block pipeline — a streaming
    read, no gather op.  Only the sparse remainder is gathered.
    Cluster ordering concentrates each tile's senders in its own few
    blocks, so the dense pairs carry most edges while the gathered slot
    count drops ~2x.
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    if len(senders) == 0:
        return None
    TN, CU = tile_rows, cu
    order_perm, pos = _locality_order(senders, receivers, n_nodes,
                                      TN, seed=seed)
    s_p = pos[senders]
    r_p = pos[receivers]
    num_tiles = -(-n_nodes // TN)
    n_blocks = -(-n_nodes // CU)
    tile_of = r_p // TN
    local_row = r_p - tile_of * TN
    blk_of = s_p // CU
    within_blk = s_p - blk_of * CU

    # dense/sparse split over (tile, source-block) pairs
    pair_key = tile_of * n_blocks + blk_of
    pk, p_inv, p_cnt = np.unique(pair_key, return_inverse=True,
                                 return_counts=True)
    dense_pair = p_cnt >= threshold
    edge_dense = dense_pair[p_inv]

    # direct jobs: one per dense pair, tile-major order (pk is sorted)
    d_tile = (pk[dense_pair] // n_blocks).astype(np.int64)
    d_blk = (pk[dense_pair] % n_blocks).astype(np.int64)
    dir_per_tile = np.bincount(d_tile, minlength=num_tiles)
    # rank of each direct job within its tile (d_tile sorted)
    d_rank = np.arange(len(d_tile)) - np.searchsorted(d_tile, d_tile)

    # remote slots: unique (tile, sender) over sparse edges
    sp_mask = ~edge_dense
    k2 = tile_of[sp_mask] * n_nodes + s_p[sp_mask]
    uk, inv2 = np.unique(k2, return_inverse=True)
    u_tile = (uk // n_nodes).astype(np.int64)
    u_node = (uk % n_nodes).astype(np.int64)
    u_cnt = np.bincount(u_tile, minlength=num_tiles)
    rem_per_tile = -(-u_cnt // CU)
    u_start = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(u_cnt, out=u_start[1:])
    pos_in_tile = np.arange(len(uk), dtype=np.int64) - u_start[u_tile]

    jobs_per_tile = dir_per_tile + rem_per_tile
    job_offsets = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(jobs_per_tile, out=job_offsets[1:])
    total_jobs = int(job_offsets[-1])
    if total_jobs == 0:
        return None
    max_jobs = int(jobs_per_tile.max())

    # global job ids (per tile: direct jobs first, then remote)
    dir_job = job_offsets[d_tile] + d_rank                     # per pair
    rem_job_of_slot = (job_offsets[u_tile] + dir_per_tile[u_tile]
                       + pos_in_tile // CU)

    # --- chunking: uniform tiles-per-chunk, remote-row budget ---------
    total_rem_jobs = int(rem_per_tile.sum())
    target_rem = max(1, chunk_rows // CU)
    mean_rem = max(float(rem_per_tile.mean()), 1e-9)
    tpc = max(1, min(num_tiles, int(target_rem / mean_rem)))
    n_chunks = -(-num_tiles // tpc)
    t_lo = np.minimum(np.arange(n_chunks) * tpc, num_tiles)
    t_hi = np.minimum((np.arange(n_chunks) + 1) * tpc, num_tiles)
    chunk_job_lo = job_offsets[t_lo]
    chunk_job_hi = job_offsets[t_hi]
    jobs_pad = int((chunk_job_hi - chunk_job_lo).max())
    if jobs_pad == 0:
        return None
    rem_offsets = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(rem_per_tile, out=rem_offsets[1:])
    chunk_rem_lo = rem_offsets[t_lo]
    chunk_rem_hi = rem_offsets[t_hi]
    rem_pad = max(int((chunk_rem_hi - chunk_rem_lo).max()), 1)

    # chunk of each job / padded job position (direct into final layout)
    chunk_of_tile = np.minimum(np.arange(num_tiles) // tpc, n_chunks - 1)

    def padded_job(job_ids, tiles):
        c = chunk_of_tile[tiles]
        return c * jobs_pad + (job_ids - chunk_job_lo[c])

    pj_dir = padded_job(dir_job, d_tile)                   # per dense pair
    pj_rem_slot = padded_job(rem_job_of_slot, u_tile)      # per slot

    # --- W blocks, scattered straight into the padded layout ----------
    w_out = np.zeros((n_chunks * jobs_pad, TN, CU), dtype=np.int8)
    w_idx_parts = []
    if edge_dense.any():
        # map pair index (pk space) -> padded direct-job position
        pair_to_pj = np.full(len(pk), -1, dtype=np.int64)
        pair_to_pj[np.nonzero(dense_pair)[0]] = pj_dir
        w_idx_parts.append(
            (pair_to_pj[p_inv[edge_dense]] * TN
             + local_row[edge_dense]) * CU + within_blk[edge_dense])
    if sp_mask.any():
        w_idx_parts.append(
            (pj_rem_slot[inv2].astype(np.int64) * TN
             + local_row[sp_mask]) * CU + pos_in_tile[inv2] % CU)
    w_idx = np.concatenate(w_idx_parts) if w_idx_parts else \
        np.zeros(0, np.int64)
    w_idx.sort(kind="stable")
    boundary = np.empty(len(w_idx), dtype=bool)
    if len(w_idx):
        boundary[0] = True
        np.not_equal(w_idx[1:], w_idx[:-1], out=boundary[1:])
    starts = np.nonzero(boundary)[0]
    cnts = np.diff(np.append(starts, len(w_idx)))
    if cnts.max(initial=0) > 127:
        return None  # int8 count overflow
    w_flat = w_out.reshape(-1)
    w_flat[w_idx[starts]] = cnts.astype(np.int8)
    w_out = w_out.reshape(n_chunks, jobs_pad, TN, CU)

    # --- remote gather ids, packed per chunk ---------------------------
    # chunk-relative remote-job rank of each slot: remote-job index
    # within its tile + remote jobs before the tile - chunk base
    c_of_slot = chunk_of_tile[u_tile]
    rem_rank = (rem_job_of_slot
                - (job_offsets[u_tile] + dir_per_tile[u_tile])
                + rem_offsets[u_tile] - chunk_rem_lo[c_of_slot])
    u_out = np.zeros((n_chunks, rem_pad * CU), dtype=np.int32)
    u_out.reshape(-1)[c_of_slot * (rem_pad * CU) + rem_rank * CU
                      + pos_in_tile % CU] = u_node
    # NB padding rem jobs gather row 0 (counted in the cost model)

    # --- per-job scalar-prefetch arrays --------------------------------
    is_dir = np.zeros(n_chunks * jobs_pad, dtype=np.int32)
    is_dir[pj_dir] = 1
    dblk_vals = np.zeros(n_chunks * jobs_pad, dtype=np.int64)
    dblk_vals[pj_dir] = d_blk
    dir_blk = _ffill(dblk_vals, is_dir.astype(bool)).astype(np.int32)
    # remote jobs' chunk-relative block (dedup slots per job via unique)
    rem_jobs_pj = np.unique(pj_rem_slot) if sp_mask.any() else \
        np.zeros(0, np.int64)
    rblk_vals = np.zeros(n_chunks * jobs_pad, dtype=np.int64)
    has_rem = np.zeros(n_chunks * jobs_pad, dtype=bool)
    if len(rem_jobs_pj):
        # rank = rem_rank of any slot of that job (all slots share it)
        order = np.argsort(pj_rem_slot, kind="stable")
        firsts = order[np.searchsorted(pj_rem_slot[order], rem_jobs_pj)]
        rblk_vals[rem_jobs_pj] = rem_rank[firsts]
        has_rem[rem_jobs_pj] = True
    rem_blk = _ffill(rblk_vals, has_rem).astype(np.int32)
    # ffill must not carry ACROSS chunks for rem_blk (chunk-relative):
    # reset leading carried values per chunk to 0 is unnecessary —
    # clamped indices only avoid refetches; any in-range value is safe.
    rem_blk = np.minimum(rem_blk, rem_pad - 1)

    # chunk-rebased tile job offsets
    offs_out = np.zeros((n_chunks, tpc + 1), dtype=np.int64)
    for c in range(n_chunks):
        a, b = int(t_lo[c]), int(t_hi[c])
        offs_out[c, :b - a + 1] = job_offsets[a:b + 1] - chunk_job_lo[c]
        offs_out[c, b - a + 1:] = offs_out[c, b - a]

    return ChunkedDedupTiles(
        u_senders=u_out,
        w_blocks=w_out,
        job_offsets=offs_out.astype(np.int32),
        pos=pos.astype(np.int32),
        perm=order_perm.astype(np.int32),
        dir_blk=dir_blk.reshape(n_chunks, jobs_pad),
        rem_blk=rem_blk.reshape(n_chunks, jobs_pad),
        is_dir=is_dir.reshape(n_chunks, jobs_pad),
        tile_rows=TN, cu=CU, max_jobs=max_jobs, num_tiles=num_tiles)


@struct.dataclass
class Graph:
    """Padded COO+CSR graph.  All arrays int32; topology only (node/edge
    features travel separately, keeping this pytree cheap to donate).

    Aggregation semantics match DGL's ``update_all(copy_src, sum)``:
    output row *i* sums over the senders of edges whose receiver is *i*
    (reference: cluster_gcn/modules.py:224-225).
    """

    senders: jnp.ndarray     # (E_pad,) source node of each edge
    receivers: jnp.ndarray   # (E_pad,) dest node; padding entries == n_nodes
    indptr: jnp.ndarray      # (N+1,) CSR offsets into the receiver-sorted edges
    in_degrees: jnp.ndarray  # (N,) float32 — true in-degree per node
    out_degrees: jnp.ndarray  # (N,) float32 — true out-degree per node
    # Transpose (sender-sorted) view for the backward pass dx = A^T dy:
    # edge (s, r) re-listed as (r -> s), sorted by s.  Padding senders_t
    # entries == n_nodes.
    t_senders: jnp.ndarray    # (E_pad,) = receivers re-sorted
    t_receivers: jnp.ndarray  # (E_pad,) = senders re-sorted (the segment key)
    t_indptr: jnp.ndarray     # (N+1,) CSR offsets over t_receivers
    n_nodes: int = struct.field(pytree_node=False)
    n_edges: int = struct.field(pytree_node=False)
    # Optional tile-aligned layouts for the Pallas SpMM kernels (forward
    # and transpose/backward); built by with_tiles().  ``dedup`` is the
    # v2 block-dense unique-sender layout (preferred); ``tiled`` the v1
    # gather+segment-reduce layout (fallback).
    tiled: Optional["TiledCSR"] = None
    tiled_t: Optional["TiledCSR"] = None
    dedup: Optional["DedupTiles"] = None
    dedup_t: Optional["DedupTiles"] = None
    # chunked v2 layout for graphs too large for one-shot gather
    dedup_c: Optional["ChunkedDedupTiles"] = None
    dedup_c_t: Optional["ChunkedDedupTiles"] = None

    def transpose(self) -> "Graph":
        """Graph of A^T (senders/receivers swapped), sharing buffers."""
        return Graph(
            senders=self.t_senders, receivers=self.t_receivers,
            indptr=self.t_indptr, in_degrees=self.out_degrees,
            out_degrees=self.in_degrees, t_senders=self.senders,
            t_receivers=self.receivers, t_indptr=self.indptr,
            n_nodes=self.n_nodes, n_edges=self.n_edges,
            tiled=self.tiled_t, tiled_t=self.tiled,
            dedup=self.dedup_t, dedup_t=self.dedup,
            dedup_c=self.dedup_c_t, dedup_c_t=self.dedup_c)

    @property
    def n_edges_padded(self) -> int:
        return self.senders.shape[0]

    def with_tiles(self, tile_rows: int = 128, mode: str = "dedup",
                   chunk_rows: int = 4 * 2 ** 20,
                   transpose: bool = True) -> "Graph":
        """Return a copy carrying the Pallas tile layouts (host-side
        rebuild from the existing edge arrays); no-op if present.

        ``mode="dedup"`` builds the v2 block-dense unique-sender layout
        — flat when it fits, else the chunked variant (huge graphs),
        else the v1 gather layout; ``mode="dedup-chunked"`` forces
        chunked; ``mode="gather"`` forces v1.  ``chunk_rows`` bounds
        one chunk's gathered unique rows (lower it for wide features).
        ``transpose=False`` skips the transpose layout (backward path)
        — at 100M-edge scale each chunked W is GiBs of HBM, and a
        forward-only consumer (full-graph eval) must not pay for both.
        """
        s = np.asarray(self.senders[:self.n_edges]).astype(np.int64)
        r = np.asarray(self.receivers[:self.n_edges]).astype(np.int64)
        t_s = np.asarray(self.t_senders[:self.n_edges]).astype(np.int64)
        t_r = np.asarray(self.t_receivers[:self.n_edges]).astype(np.int64)
        # one flat gather of all unique rows beyond ~8M is HBM-hostile
        # regardless of W size: go straight to the chunked layout
        huge = self.n_edges > 16 * 2 ** 20
        if mode == "dedup-chunked" or (mode == "dedup" and huge):
            if self.dedup_c is not None or self.dedup is not None:
                return self
            d = _build_dedup_chunked(s, r, self.n_nodes,
                                     tile_rows=tile_rows,
                                     chunk_rows=chunk_rows)
            if d is not None and not transpose:
                return self.replace(dedup_c=d.to_device())
            d_t = None if d is None else _build_dedup_chunked(
                t_s, t_r, self.n_nodes, tile_rows=tile_rows,
                chunk_rows=chunk_rows)
            if d is not None and d_t is not None:
                return self.replace(dedup_c=d.to_device(),
                                    dedup_c_t=d_t.to_device())
            # fall through (dedup -> flat attempt; dedup-chunked -> v1)
            mode = "dedup" if mode == "dedup" and not huge else "gather"
        if mode == "dedup":
            if self.dedup is not None:
                return self
            d = _build_dedup_tiles(s, r, self.n_nodes, tile_rows=tile_rows)
            d_t = None if d is None else _build_dedup_tiles(
                t_s, t_r, self.n_nodes, tile_rows=tile_rows)
            if d is not None and d_t is not None:
                return self.replace(dedup=d, dedup_t=d_t)
            # fall through to the v1 layout
        if self.tiled is not None:
            return self
        indptr = np.asarray(self.indptr, dtype=np.int64)
        t_indptr = np.asarray(self.t_indptr, dtype=np.int64)
        tiled, f_dst = _build_tiled_csr(
            s.astype(np.int32), r.astype(np.int32), indptr, self.n_nodes,
            tile_rows=tile_rows)
        tiled_t, t_dst = _build_tiled_csr(
            t_s.astype(np.int32), t_r.astype(np.int32), t_indptr,
            self.n_nodes, tile_rows=tile_rows)
        # s is receiver-sorted; argsort reproduces the sender-sort
        # permutation used to build the transpose arrays
        t_order = np.argsort(s, kind="stable")
        tiled, tiled_t = _link_tiled_pair(tiled, f_dst, tiled_t, t_dst,
                                          t_order, self.n_edges)
        return self.replace(tiled=tiled, tiled_t=tiled_t)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Graph(n_nodes={self.n_nodes}, n_edges={self.n_edges}, "
                f"padded={self.n_edges_padded})")


def graph_from_edges(
    senders,
    receivers,
    n_nodes: int,
    *,
    edge_pad_multiple: int = 8,
    pad_to: Optional[int] = None,
    tiles: bool = False,
    tile_rows: int = 128,
    tile_mode: str = "dedup",
    numpy: bool = False,
) -> Graph:
    """Build a receiver-sorted padded Graph from a raw COO edge list.

    Host-side (numpy) preprocessing — runs once per graph / cluster
    bucket, off the jit path.  ``numpy=True`` leaves the arrays on the
    host (for callers that stack many graphs before one device
    transfer — per-batch H2D through a remote tunnel costs more than
    the batch compute).
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    assert senders.shape == receivers.shape and senders.ndim == 1
    n_edges = int(senders.shape[0])

    order = np.argsort(receivers, kind="stable")
    senders = senders[order]
    receivers = receivers[order]

    e_pad = pad_to if pad_to is not None else _round_up(max(n_edges, 1), edge_pad_multiple)
    if e_pad < n_edges:
        raise ValueError(f"pad_to={e_pad} < n_edges={n_edges}")
    pad = e_pad - n_edges
    # Padding senders point at node 0 (any valid id); padding receivers
    # point at n_nodes so segment_sum drops them.
    senders_p = np.concatenate([senders, np.zeros(pad, dtype=np.int64)])
    receivers_p = np.concatenate([receivers, np.full(pad, n_nodes, dtype=np.int64)])

    counts = np.bincount(receivers, minlength=n_nodes)[:n_nodes]
    out_counts = np.bincount(senders, minlength=n_nodes)[:n_nodes]
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])

    # transpose view: edges (r -> s) sorted by s
    t_order = np.argsort(senders, kind="stable")
    t_receivers = senders[t_order]      # segment key of the transpose
    t_senders = receivers[t_order]
    t_senders_p = np.concatenate([t_senders, np.zeros(pad, dtype=np.int64)])
    t_receivers_p = np.concatenate(
        [t_receivers, np.full(pad, n_nodes, dtype=np.int64)])
    t_indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(out_counts, out=t_indptr[1:])

    conv = (lambda a, dt: np.asarray(a, dtype=dt)) if numpy \
        else (lambda a, dt: jnp.asarray(a, dtype=dt))
    g = Graph(
        senders=conv(senders_p, np.int32),
        receivers=conv(receivers_p, np.int32),
        indptr=conv(indptr, np.int32),
        in_degrees=conv(counts, np.float32),
        out_degrees=conv(out_counts, np.float32),
        t_senders=conv(t_senders_p, np.int32),
        t_receivers=conv(t_receivers_p, np.int32),
        t_indptr=conv(t_indptr, np.int32),
        n_nodes=int(n_nodes),
        n_edges=n_edges,
    )
    if tiles:
        g = g.with_tiles(tile_rows=tile_rows, mode=tile_mode)
    return g


def add_self_loops(senders, receivers, n_nodes: int, *, dedup: bool = True):
    """Remove existing self loops and append one per node — the
    preprocessing gcn/train.py:66-68 applies before building its graph."""
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    if dedup:
        keep = senders != receivers
        senders, receivers = senders[keep], receivers[keep]
    loop = np.arange(n_nodes, dtype=np.int64)
    return np.concatenate([senders, loop]), np.concatenate([receivers, loop])


def subgraph(senders, receivers, node_ids, n_nodes: int):
    """Node-induced subgraph with relabeled ids — the analog of
    ``g.subgraph(nids)`` used by the cluster sampler
    (cluster_gcn/partition_utils.py:20-25).  Host-side numpy.

    Returns (sub_senders, sub_receivers, node_ids) where edges are those
    with both endpoints in ``node_ids``, relabeled to [0, len(node_ids)).
    """
    node_ids = np.asarray(node_ids, dtype=np.int64)
    mapping = np.full(n_nodes, -1, dtype=np.int64)
    mapping[node_ids] = np.arange(len(node_ids), dtype=np.int64)
    s = mapping[np.asarray(senders, dtype=np.int64)]
    r = mapping[np.asarray(receivers, dtype=np.int64)]
    keep = (s >= 0) & (r >= 0)
    return s[keep], r[keep], node_ids


# ---------------------------------------------------------------------------
# Normalization factors
# ---------------------------------------------------------------------------

def sym_norm(graph: Graph) -> jnp.ndarray:
    """Symmetric GCN norm ``deg^{-1/2}`` with inf→0, matching
    gcn/train.py:74-78 (used by the GraphConv path)."""
    deg = graph.in_degrees
    norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1.0)), 0.0)
    return norm


def inv_degree_norm(graph: Graph) -> jnp.ndarray:
    """Mean-aggregation norm ``1/deg`` with inf→0, matching
    cluster_gcn/modules.py:155-159 / 239-243 (GraphSAGE path)."""
    deg = graph.in_degrees
    return jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
