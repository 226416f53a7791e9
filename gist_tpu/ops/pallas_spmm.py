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
     multiples of C=1024).
  2. (Pallas) grid over destination tiles of TN rows.  The tile's
     messages are a contiguous, 1024-row-aligned range of ``msgs`` —
     streamed through VMEM in double-buffered (C, F) chunks — and the
     scatter-accumulate becomes an MXU matmul with a one-hot
     local-receiver matrix:

        one_hot[t, j] = (receivers[j] - i*TN == t)     (TN, C)
        acc += one_hot @ chunk                          (fp32 MXU)

Padding edges carry receiver == num_tiles*TN (outside every tile's
local range) so their one-hot columns are zero — no masking.  Mosaic
alignment notes: 1-D i32 DMA slices need 1024-aligned offset+size
(hence C=1024 and the TiledCSR padding); 2-D row-chunk slices need
8-row alignment (1024-aligned offsets satisfy it); full minor dims
need no lane padding.

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

NBUF = 2


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _reduce_kernel(tile_offsets_ref,    # SMEM (num_tiles+1,) scalar prefetch
                   msgs_ref,            # HBM (E_t, F) gathered source rows
                   receivers_ref,       # HBM (E_t,)
                   out_ref,             # VMEM (TN, F) current dst tile
                   recv_ref,            # VMEM scratch (NBUF, C)
                   staging_ref,         # VMEM scratch (NBUF, C, F)
                   acc_ref,             # VMEM scratch (TN, F) fp32
                   recv_sem, row_sem,   # DMA semaphore arrays (NBUF,)
                   *, TN: int, C: int):
    i = pl.program_id(0)
    e0 = tile_offsets_ref[i]
    nchunks = (tile_offsets_ref[i + 1] - e0) // C

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def dmas(c):
        e = pl.multiple_of(e0 + c * C, C)
        slot = jax.lax.rem(c, NBUF)
        return (
            pltpu.make_async_copy(receivers_ref.at[pl.ds(e, C)],
                                  recv_ref.at[slot], recv_sem.at[slot]),
            pltpu.make_async_copy(msgs_ref.at[pl.ds(e, C), :],
                                  staging_ref.at[slot], row_sem.at[slot]),
        )

    @pl.when(nchunks > 0)
    def _():
        for d in dmas(0):
            d.start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, NBUF)

        @pl.when(c + 1 < nchunks)
        def _():
            for d in dmas(c + 1):
                d.start()

        for d in dmas(c):
            d.wait()

        local = recv_ref[slot].astype(jnp.int32) - i * TN       # (C,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TN, C), 0)
        one_hot = (rows == local[None, :]).astype(jnp.float32)  # (TN, C)
        acc_ref[...] += jax.lax.dot(
            one_hot, staging_ref[slot].astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows", "chunk", "n_nodes"))
def _spmm_tiled(tile_offsets, senders, receivers, x, *,
                tile_rows: int, chunk: int, n_nodes: int):
    TN, C = tile_rows, chunk
    f = x.shape[1]
    num_tiles = tile_offsets.shape[0] - 1
    # Phase 1: XLA gather into tile-aligned edge order.
    msgs = jnp.take(x, senders, axis=0)
    # Phase 2: Pallas tiled segment reduce (scatter-free).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # msgs
            pl.BlockSpec(memory_space=pltpu.HBM),   # receivers
        ],
        out_specs=pl.BlockSpec((TN, f), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, C), jnp.int32),
            pltpu.VMEM((NBUF, C, f), x.dtype),
            pltpu.VMEM((TN, f), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    e_t = int(senders.shape[0])
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, TN=TN, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TN, f), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_t * f * TN,
            bytes_accessed=e_t * (f * 4 + 4) + num_tiles * TN * f * 4,
            transcendentals=0,
        ),
    )(tile_offsets, msgs, receivers)
    return out[:n_nodes]


def _run_tiled(t: TiledCSR, x: jnp.ndarray, n_nodes: int) -> jnp.ndarray:
    f = x.shape[1]
    vmem_need = (NBUF * t.chunk * f + 2 * t.tile_rows * f) * 4
    if vmem_need > 13 * 2 ** 20:
        raise NotImplementedError(
            f"feature width {f} needs {vmem_need >> 20} MiB VMEM; "
            "feature-tiling not implemented yet — use the segment backend")
    return _spmm_tiled(t.tile_offsets, t.senders, t.receivers, x,
                       tile_rows=t.tile_rows, chunk=t.chunk,
                       n_nodes=n_nodes)


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
