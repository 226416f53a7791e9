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

from gist_tpu.graph import Graph, TiledCSR


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


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
    if graph.tiled is None:
        raise NotImplementedError(
            "graph built without tiles=True; pallas backend unavailable")
    return _run_tiled(graph.tiled, x, graph.n_nodes)


def _spmm_fwd(graph, x):
    return _spmm_forward(graph, x), graph


def _spmm_bwd(graph, g):
    if graph.tiled_t is None:
        raise NotImplementedError("graph missing transpose tiles")
    dx = _run_tiled(graph.tiled_t, g, graph.n_nodes)
    return None, dx


spmm_pallas_csr.defvjp(_spmm_fwd, _spmm_bwd)
