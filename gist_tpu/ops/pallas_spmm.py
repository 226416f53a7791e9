"""Pallas TPU SpMM: gather-then-tiled-segment-reduce.

The hot aggregation op (``out[r] = sum_{(s,r)} x[s]``).  Measured on a
v5e chip with a Reddit-shaped graph (E=2.3M, F=602), the XLA segment
path (gist_tpu/ops/spmm.py) runs at ~70 ms: the row gather is fine
(~20 ms) but ``segment_sum``'s scatter-add is ~67 ms — 10x off the HBM
roofline.  This kernel keeps XLA's fast gather and replaces the scatter
entirely:

  1. (XLA) ``msgs = x[tiled.senders]`` — gather source rows in
     *tile-aligned edge order* (gist_tpu.graph.TiledCSR: edges
     receiver-sorted, each destination tile's segment padded to
     multiples of C=1024, so every chunk of every tile sits at a
     C-aligned offset).
  2. (Pallas) 2-D grid (dst_tile i, chunk c) driving the AUTOMATIC
     block pipeline — no manual DMA/semaphores, Mosaic double-buffers
     the (C, F) message block and (1, C) receiver block whose indices
     the scalar-prefetched tile_offsets compute.  The
     scatter-accumulate becomes an MXU matmul with a one-hot
     local-receiver matrix:

        one_hot[t, j] = (receivers[j] - i*TN == t)     (TN, C)
        acc += one_hot @ chunk                          (fp32 MXU)

     The output block index depends only on i, so acc lives in VMEM
     across the chunk loop (standard revisited-block reduction).
     Tiles with fewer than max_chunks chunks clamp their block index
     (no re-fetch) and skip compute via @pl.when.

Padding edges carry receiver == num_tiles*TN (outside every tile's
local range) so their one-hot columns are zero — no masking.

Backward: dx = A^T dy runs the same two phases on the transpose
TiledCSR (custom_vjp), so autodiff never touches XLA scatter either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gist_tpu.graph import ChunkedDedupTiles, DedupTiles, Graph, TiledCSR


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# v2: block-dense dedup kernel (preferred path)
#
# Host-side (gist_tpu.graph.DedupTiles) each dst tile lists its UNIQUE
# senders once; the local adjacency is dense int8 count blocks
# W[j] : (TN, CU) paired 1:1 with CU-row blocks of gathered unique
# source rows.  Phase 1 gathers |U| rows instead of E rows (|U|/E ~ 0.35
# under cluster ordering), and the kernel is a plain blocked matmul
# accumulation acc += W @ u — no scatter, no one-hot building, ~d * the
# v1 HBM traffic.
# ---------------------------------------------------------------------------


def _dedup_kernel(job_offsets_ref,   # SMEM (num_tiles+1,) scalar prefetch
                  w_ref,             # VMEM (1, TN, CU) int8 count block
                  u_hi_ref,          # VMEM (CU, TF) bf16 hi (or sole) part
                  u_lo_ref,          # VMEM (CU, TF) bf16 lo part (None: bf16)
                  out_ref,           # VMEM (TN, TF) dst tile (revisited)
                  acc0_ref,          # VMEM scratch (TN, TF) fp32
                  acc1_ref):         # VMEM scratch (TN, TF) fp32
    # Two accumulators alternating by job parity: consecutive grid steps
    # write different scratch buffers, so their matmuls have no data
    # dependency and the MXU pipeline never stalls on the accumulate.
    i = pl.program_id(0)
    c = pl.program_id(2)
    njobs = job_offsets_ref[i + 1] - job_offsets_ref[i]

    @pl.when(c == 0)
    def _():
        acc0_ref[...] = jnp.zeros_like(acc0_ref)
        acc1_ref[...] = jnp.zeros_like(acc1_ref)

    @pl.when(c < njobs)
    def _():
        w = w_ref[0].astype(jnp.bfloat16)        # counts <= 127: bf16-exact
        u = u_hi_ref[...]
        if u_lo_ref is not None or u.dtype == jnp.bfloat16:
            contrib = jax.lax.dot(w, u, preferred_element_type=jnp.float32)
            if u_lo_ref is not None:
                contrib += jax.lax.dot(w, u_lo_ref[...],
                                       preferred_element_type=jnp.float32)
        else:
            # fp32 block: split into hi + lo bf16 in-VMEM (the MXU runs
            # fp32 dots at bf16 precision; W is bf16-exact, so two
            # full-speed passes recover ~1e-5 relative error)
            u = u.astype(jnp.float32)
            hi = u.astype(jnp.bfloat16)
            lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            contrib = (jax.lax.dot(w, hi, preferred_element_type=jnp.float32)
                       + jax.lax.dot(w, lo,
                                     preferred_element_type=jnp.float32))

        @pl.when(c % 2 == 0)
        def _():
            acc0_ref[...] += contrib

        @pl.when(c % 2 == 1)
        def _():
            acc1_ref[...] += contrib

    @pl.when(c == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = (acc0_ref[...] + acc1_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows", "cu", "max_jobs",
                                             "f_tile", "out_dtype"))
def _spmm_dedup_call(job_offsets, w_blocks, u_hi, u_lo, *,
                     tile_rows: int, cu: int, max_jobs: int, f_tile: int,
                     out_dtype):
    TN, CU = tile_rows, cu
    f = u_hi.shape[1]
    num_tiles = job_offsets.shape[0] - 1
    n_jobs_total = w_blocks.shape[0]
    f_tiles = _cdiv(f, f_tile)
    if f % f_tile:
        pad = ((0, 0), (0, f_tiles * f_tile - f))
        u_hi = jnp.pad(u_hi, pad)
        u_lo = None if u_lo is None else jnp.pad(u_lo, pad)

    def job_index(i, fi, c, offs):
        # clamp into the tile's job range (skipped iterations repeat the
        # previous block index so the pipeline elides the re-fetch);
        # empty tiles clamp globally
        first = offs[i]
        last = jnp.maximum(offs[i + 1] - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_jobs_total - 1)

    u_spec = pl.BlockSpec(
        (CU, f_tile),
        lambda i, fi, c, offs: (job_index(i, fi, c, offs), fi),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(
            (1, TN, CU),
            lambda i, fi, c, offs: (job_index(i, fi, c, offs), 0, 0),
            memory_space=pltpu.VMEM),
        u_spec,
    ]
    operands = [job_offsets, w_blocks, u_hi]
    if u_lo is not None:
        in_specs.append(u_spec)
        operands.append(u_lo)
    if u_lo is not None:
        kernel = _dedup_kernel
    else:
        def kernel(offs, w, uh, out, a0, a1):
            return _dedup_kernel(offs, w, uh, None, out, a0, a1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, f_tiles, max_jobs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TN, f_tile),
                               lambda i, fi, c, offs: (i, fi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TN, f_tile), jnp.float32),
            pltpu.VMEM((TN, f_tile), jnp.float32),
        ],
    )
    nbytes = u_hi.dtype.itemsize * (1 if u_lo is None else 2)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TN, f_tiles * f_tile),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_jobs_total * TN * CU * f
            * (1 if u_lo is None else 2),
            bytes_accessed=(n_jobs_total * (TN * CU + CU * f * nbytes)
                            + num_tiles * TN * f * 4),
            transcendentals=0,
        ),
    )(*operands)


def _pick_f_tile_dedup(f: int, cu: int, tile_rows: int,
                       itemsize: int) -> int:
    """Largest feature tile keeping double-buffered u blocks + accs/out
    within ~12 MiB of VMEM."""
    budget = 12 * 2 ** 20
    ft = f
    while ft > 128 and (2 * cu * ft * itemsize
                        + 3 * tile_rows * ft * 4) > budget:
        ft = (ft + 1) // 2
    return max(128, min(ft, f))


def _run_dedup(t: DedupTiles, x: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    if t.max_jobs == 0:
        return jnp.zeros((n_nodes, x.shape[1]), x.dtype)
    f = x.shape[1]
    if t.perm is not None:
        # one streaming permute so per-tile gather indices are sorted
        # and cluster-local (u_senders are in permuted space)
        x = jnp.take(x, t.perm, axis=0)
    f_tile = _pick_f_tile_dedup(f, t.cu, t.tile_rows, x.dtype.itemsize)
    # pad the SOURCE table to the feature tile before gathering: padding
    # the (much larger) gathered buffer afterwards costs an extra full
    # pass over ~d*E*F bytes per call
    f_tiles = _cdiv(f, f_tile)
    if f % f_tile:
        x = jnp.pad(x, ((0, 0), (0, f_tiles * f_tile - f)))
    u_rows = jnp.take(x, t.u_senders, axis=0)        # (U_pad, F_pad)
    out = _spmm_dedup_call(t.job_offsets, t.w_blocks, u_rows, None,
                           tile_rows=t.tile_rows, cu=t.cu,
                           max_jobs=t.max_jobs, f_tile=f_tile,
                           out_dtype=x.dtype)
    if t.pos is not None:
        return jnp.take(out, t.pos, axis=0)[:, :f]
    return out[:n_nodes, :f]


def _run_dedup_chunked(t: ChunkedDedupTiles, x: jnp.ndarray,
                       n_nodes: int) -> jnp.ndarray:
    """Chunked v2: features and W stay resident; each chunk gathers its
    own bounded slice of unique rows and runs the same compiled kernel
    (uniform chunk shapes).  ``lax.scan`` serializes the chunks — an
    unrolled Python loop lets XLA schedule chunks concurrently, which
    materialized ~10 chunks' gathers + W slices at once and blew HBM at
    Amazon2M scale.  x is padded to the feature tile ONCE so no 1.3x
    pad temp appears per chunk."""
    if t.max_jobs == 0:
        return jnp.zeros((n_nodes, x.shape[1]), x.dtype)
    f = x.shape[1]
    if t.perm is not None:
        x = jnp.take(x, t.perm, axis=0)  # see _run_dedup
    f_tile = _pick_f_tile_dedup(f, t.cu, t.tile_rows, x.dtype.itemsize)
    f_tiles = _cdiv(f, f_tile)
    if f % f_tile:
        x_p = jnp.pad(x, ((0, 0), (0, f_tiles * f_tile - f)))
    else:
        x_p = x
    max_jobs = min(t.max_jobs, int(t.w_blocks.shape[1]))

    def body(_, chunk):
        offs, w, u_idx = chunk
        u_rows = jnp.take(x_p, u_idx, axis=0)
        out_c = _spmm_dedup_call(offs, w, u_rows, None,
                                 tile_rows=t.tile_rows, cu=t.cu,
                                 max_jobs=max_jobs, f_tile=f_tile,
                                 out_dtype=x.dtype)
        return None, out_c

    _, outs = jax.lax.scan(body, None,
                           (t.job_offsets, t.w_blocks, t.u_senders))
    out = outs.reshape(-1, outs.shape[-1])
    if t.pos is not None:
        return jnp.take(out, t.pos, axis=0)[:, :f]
    return out[:n_nodes, :f]


# ---------------------------------------------------------------------------
# v3: split dedup kernel (direct-stream + gathered-remote)
#
# Round 2's chunked kernel was bound by the XLA row-gather op rate
# (~85M rows/s — PERF.md).  Host-side, dense (dst-tile, source-block)
# pairs become "direct" jobs whose (CU, F) source block the pipeline
# streams straight out of the resident permuted feature table (block
# index from scalar-prefetched dir_blk) — no gather op; only sparse
# remainder slots are gathered (u_senders).  Per grid step the kernel
# selects the active stream with is_dir; the inactive ref's block index
# is carried forward by the host-built arrays, so the pipeline skips
# its re-fetch (revisited-block elision) and HBM traffic stays ~one
# block per job.
# ---------------------------------------------------------------------------


def _split_hi_lo_dot(w, u):
    """acc contribution with the fp32 -> hi/lo bf16 split (see
    _dedup_kernel: the MXU runs fp32 dots at bf16 precision; W is
    bf16-exact so two full-speed passes recover ~1e-5 rel error)."""
    if u.dtype == jnp.bfloat16:
        return jax.lax.dot(w, u, preferred_element_type=jnp.float32)
    u = u.astype(jnp.float32)
    hi = u.astype(jnp.bfloat16)
    lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot(w, hi, preferred_element_type=jnp.float32)
            + jax.lax.dot(w, lo, preferred_element_type=jnp.float32))


def _split_kernel(job_offsets_ref,  # SMEM scalar prefetch (tiles+1,)
                  dir_blk_ref,      # SMEM (jobs_pad,)
                  rem_blk_ref,      # SMEM (jobs_pad,) [unused in body]
                  is_dir_ref,       # SMEM (jobs_pad,)
                  w_ref,            # VMEM (1, TN, CU) int8
                  x_ref,            # VMEM (CU, TF) direct source block
                  u_ref,            # VMEM (CU, TF) gathered remote block
                  out_ref,          # VMEM (TN, TF) dst tile (revisited)
                  acc0_ref, acc1_ref, *, n_jobs_total: int):
    i = pl.program_id(0)
    c = pl.program_id(2)
    njobs = job_offsets_ref[i + 1] - job_offsets_ref[i]

    @pl.when(c == 0)
    def _():
        acc0_ref[...] = jnp.zeros_like(acc0_ref)
        acc1_ref[...] = jnp.zeros_like(acc1_ref)

    @pl.when(c < njobs)
    def _():
        # same clamped job index the BlockSpec index maps computed
        first = job_offsets_ref[i]
        last = jnp.maximum(job_offsets_ref[i + 1] - 1, first)
        j = jnp.minimum(jnp.minimum(first + c, last), n_jobs_total - 1)
        w = w_ref[0].astype(jnp.bfloat16)
        u = jnp.where(is_dir_ref[j] == 1, x_ref[...], u_ref[...])
        contrib = _split_hi_lo_dot(w, u)

        @pl.when(c % 2 == 0)
        def _():
            acc0_ref[...] += contrib

        @pl.when(c % 2 == 1)
        def _():
            acc1_ref[...] += contrib

    @pl.when(c == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = (acc0_ref[...] + acc1_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows", "cu", "max_jobs",
                                             "f_tile", "out_dtype"))
def _spmm_split_call(job_offsets, dir_blk, rem_blk, is_dir, w_blocks,
                     x_p, u_rows, *, tile_rows: int, cu: int,
                     max_jobs: int, f_tile: int, out_dtype):
    """One chunk of the split layout.  ``x_p``: the full resident
    permuted feature table, rows padded to a CU multiple, cols to
    ``f_tile`` multiples; ``u_rows``: this chunk's gathered remote rows
    (rem_pad*CU, F_pad)."""
    TN, CU = tile_rows, cu
    num_tiles = job_offsets.shape[0] - 1
    n_jobs_total = w_blocks.shape[0]
    f_pad = x_p.shape[1]
    f_tiles = f_pad // f_tile

    def job_index(i, fi, c, offs, dblk, rblk, isd):
        first = offs[i]
        last = jnp.maximum(offs[i + 1] - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_jobs_total - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles, f_tiles, max_jobs),
        in_specs=[
            pl.BlockSpec(
                (1, TN, CU),
                lambda i, fi, c, *p: (job_index(i, fi, c, *p), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (CU, f_tile),
                lambda i, fi, c, offs, dblk, rblk, isd:
                    (dblk[job_index(i, fi, c, offs, dblk, rblk, isd)], fi),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (CU, f_tile),
                lambda i, fi, c, offs, dblk, rblk, isd:
                    (rblk[job_index(i, fi, c, offs, dblk, rblk, isd)], fi),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, f_tile),
                               lambda i, fi, c, *p: (i, fi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TN, f_tile), jnp.float32),
            pltpu.VMEM((TN, f_tile), jnp.float32),
        ],
    )
    nbytes = x_p.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_split_kernel, n_jobs_total=n_jobs_total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TN, f_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_jobs_total * TN * CU * f_pad,
            bytes_accessed=(n_jobs_total * (TN * CU + CU * f_pad * nbytes)
                            + num_tiles * TN * f_pad * 4),
            transcendentals=0,
        ),
    )(job_offsets, dir_blk, rem_blk, is_dir, w_blocks, x_p, u_rows)


def _run_dedup_split_chunked(t: ChunkedDedupTiles, x: jnp.ndarray,
                             n_nodes: int) -> jnp.ndarray:
    """Split-layout chunked runner: permute x once, pad rows to a CU
    multiple (direct blocks index it), scan chunks — each gathers only
    its remote slots."""
    if t.max_jobs == 0:
        return jnp.zeros((n_nodes, x.shape[1]), x.dtype)
    f = x.shape[1]
    if t.perm is not None:
        x = jnp.take(x, t.perm, axis=0)
    f_tile = _pick_f_tile_dedup(f, t.cu, t.tile_rows, x.dtype.itemsize)
    f_tiles = _cdiv(f, f_tile)
    n_blocks = _cdiv(x.shape[0], t.cu)
    row_pad = n_blocks * t.cu - x.shape[0]
    col_pad = f_tiles * f_tile - f
    if row_pad or col_pad:
        x_p = jnp.pad(x, ((0, row_pad), (0, col_pad)))
    else:
        x_p = x
    max_jobs = min(t.max_jobs, int(t.w_blocks.shape[1]))

    def body(_, chunk):
        offs, w, u_idx, dblk, rblk, isd = chunk
        u_rows = jnp.take(x_p, u_idx, axis=0)
        out_c = _spmm_split_call(offs, dblk, rblk, isd, w, x_p, u_rows,
                                 tile_rows=t.tile_rows, cu=t.cu,
                                 max_jobs=max_jobs, f_tile=f_tile,
                                 out_dtype=x.dtype)
        return None, out_c

    _, outs = jax.lax.scan(body, None,
                           (t.job_offsets, t.w_blocks, t.u_senders,
                            t.dir_blk, t.rem_blk, t.is_dir))
    out = outs.reshape(-1, outs.shape[-1])
    if t.pos is not None:
        return jnp.take(out, t.pos, axis=0)[:, :f]
    return out[:n_nodes, :f]


def _reduce_kernel(tile_offsets_ref,    # SMEM (num_tiles+1,) scalar prefetch
                   recv_ref,            # VMEM (1, 1, C) current receiver block
                   msgs_ref,            # VMEM (C, TF) current message block
                   out_ref,             # VMEM (TN, TF) dst tile (revisited)
                   acc_ref,             # VMEM scratch (TN, TF) fp32
                   *, TN: int, C: int):
    i = pl.program_id(0)
    c = pl.program_id(2)
    nchunks = (tile_offsets_ref[i + 1] - tile_offsets_ref[i]) // C

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(c < nchunks)
    def _():
        local = recv_ref[0, 0].astype(jnp.int32) - i * TN       # (C,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TN, C), 0)
        one_hot = (rows == local[None, :]).astype(jnp.bfloat16)  # (TN, C)
        msgs = msgs_ref[...]
        if msgs.dtype == jnp.bfloat16:
            acc_ref[...] += jax.lax.dot(
                one_hot, msgs, preferred_element_type=jnp.float32)
        else:
            # The MXU runs fp32 matmuls at bf16 precision; a plain dot
            # loses ~1e-2 relative accuracy.  The one-hot factor is
            # bf16-exact, so split the messages into hi + lo bf16 parts:
            # two full-speed bf16 passes recover ~1e-5 relative error
            # with fp32 accumulate.
            msgs = msgs.astype(jnp.float32)
            hi = msgs.astype(jnp.bfloat16)
            lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc_ref[...] += (
                jax.lax.dot(one_hot, hi, preferred_element_type=jnp.float32)
                + jax.lax.dot(one_hot, lo, preferred_element_type=jnp.float32))

    @pl.when(c == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows", "chunk",
                                             "max_chunks", "n_nodes",
                                             "f_tile"))
def _spmm_tiled(tile_offsets, senders, receivers, x, *,
                tile_rows: int, chunk: int, max_chunks: int, n_nodes: int,
                f_tile: int):
    TN, C = tile_rows, chunk
    f = x.shape[1]
    num_tiles = tile_offsets.shape[0] - 1
    e_t = int(senders.shape[0])
    f_tiles = _cdiv(f, f_tile)
    if f % f_tile:
        x = jnp.pad(x, ((0, 0), (0, f_tiles * f_tile - f)))

    # Phase 1: XLA gather into tile-aligned edge order.
    msgs = jnp.take(x, senders, axis=0)              # (E_t, F_pad)
    # 3-D so the (1, C) block's last-two dims equal the array dims
    # (Pallas TPU blocking constraint: last two dims divisible by
    # (8, 128) OR equal to the array's)
    recv3d = receivers.reshape(e_t // C, 1, C)

    n_blocks = e_t // C

    def chunk_index(i, fi, c, offs):
        # clamp into this tile's valid chunk range so skipped iterations
        # repeat the previous block index (pipeline skips the re-fetch);
        # empty TRAILING tiles would otherwise index one block past the
        # end (offs[i] == offs[i+1] == E_t), hence the global clamp
        first = offs[i] // C
        last = jnp.maximum(offs[i + 1] // C - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, f_tiles, max_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, C),
                lambda i, fi, c, offs: (chunk_index(i, fi, c, offs), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (C, f_tile),
                lambda i, fi, c, offs: (chunk_index(i, fi, c, offs), fi),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, f_tile),
                               lambda i, fi, c, offs: (i, fi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TN, f_tile), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, TN=TN, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TN, f_tiles * f_tile),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_t * f * TN,
            bytes_accessed=e_t * (f * 4 + 4) + num_tiles * TN * f * 4,
            transcendentals=0,
        ),
    )(tile_offsets, recv3d, msgs)
    return out[:n_nodes, :f]


def _pick_f_tile(f: int, chunk: int, tile_rows: int, itemsize: int) -> int:
    """Largest feature tile keeping double-buffered chunk blocks + acc
    within ~12 MiB of VMEM."""
    budget = 12 * 2 ** 20
    ft = f
    while ft > 128 and (2 * chunk * ft * itemsize
                        + 2 * tile_rows * ft * 4) > budget:
        ft = (ft + 1) // 2
    return max(128, min(ft, f))


def _run_tiled(t: TiledCSR, x: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    if t.max_chunks == 0:
        return jnp.zeros((n_nodes, x.shape[1]), x.dtype)
    f_tile = _pick_f_tile(x.shape[1], t.chunk, t.tile_rows,
                          x.dtype.itemsize)
    return _spmm_tiled(t.tile_offsets, t.senders, t.receivers, x,
                       tile_rows=t.tile_rows, chunk=t.chunk,
                       max_chunks=t.max_chunks, n_nodes=n_nodes,
                       f_tile=f_tile)


@jax.custom_vjp
def spmm_pallas_csr(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    return _spmm_forward(graph, x)


def _spmm_forward(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim != 2:
        raise NotImplementedError("pallas spmm expects (N, F) input")
    if graph.dedup is not None:
        return _run_dedup(graph.dedup, x, graph.n_nodes)
    if graph.dedup_c is not None:
        if graph.dedup_c.is_dir is not None:
            return _run_dedup_split_chunked(graph.dedup_c, x, graph.n_nodes)
        return _run_dedup_chunked(graph.dedup_c, x, graph.n_nodes)
    if graph.tiled is None:
        raise NotImplementedError(
            "graph built without tiles=True; pallas backend unavailable")
    return _run_tiled(graph.tiled, x, graph.n_nodes)


def _spmm_fwd(graph, x):
    return _spmm_forward(graph, x), graph


def _spmm_bwd(graph, g):
    if graph.dedup_t is not None:
        dx = _run_dedup(graph.dedup_t, g, graph.n_nodes)
    elif graph.dedup_c_t is not None:
        if graph.dedup_c_t.is_dir is not None:
            dx = _run_dedup_split_chunked(graph.dedup_c_t, g, graph.n_nodes)
        else:
            dx = _run_dedup_chunked(graph.dedup_c_t, g, graph.n_nodes)
    elif graph.tiled_t is not None:
        dx = _run_tiled(graph.tiled_t, g, graph.n_nodes)
    else:
        raise NotImplementedError("graph missing transpose tiles")
    return None, dx


spmm_pallas_csr.defvjp(_spmm_fwd, _spmm_bwd)
