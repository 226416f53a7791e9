"""Pallas fused GAT attention aggregation (single head):

    out[r] = sum_e  softmax_r(scores)_e * z[send(e)]

over the TiledCSR layout — the flash-attention-style counterpart of
pallas_spmm: per destination tile, an online-softmax accumulation over
edge chunks (running max ``m``, running denominator ``s``, rescaled
accumulator), so the per-destination softmax needs no scatter and no
second pass over edges.

The XLA composite (gist_tpu/ops/segment.py) runs segment_max +
segment_sum + weighted segment_sum — three scatter-bound passes; this
kernel reads scores and messages once.

Like flash attention, the probability matrix is bf16 in the MXU
matmul (messages get the hi/lo split); expect ~4e-3 relative error —
fine for training/inference, and the interpret-mode tests compare at
that tolerance.

Gradients: the custom_vjp recomputes attention with the XLA composite
and differentiates that — the forward is kernel-fast, the backward
matches XLA exactly.  A fused backward kernel is future work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gist_tpu.graph import Graph, TiledCSR

NEG_INF = -1e30


def _gat_kernel(tile_offsets_ref,   # SMEM scalar prefetch
                recv_ref,           # VMEM (1, 1, C)
                scores_ref,         # VMEM (1, 1, C)
                msgs_ref,           # VMEM (C, D)
                out_ref,            # VMEM (TN, D) revisited per tile
                m_ref,              # VMEM scratch (TN, 128) running max
                s_ref,              # VMEM scratch (TN, 128) running denom
                acc_ref,            # VMEM scratch (TN, D) fp32
                *, TN: int, C: int):
    i = pl.program_id(0)
    c = pl.program_id(1)
    nchunks = (tile_offsets_ref[i + 1] - tile_offsets_ref[i]) // C

    @pl.when(c == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(c < nchunks)
    def _():
        local = recv_ref[0, 0].astype(jnp.int32) - i * TN        # (C,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TN, C), 0)
        hot = rows == local[None, :]                             # (TN, C)
        sc = jnp.where(hot, scores_ref[0, 0][None, :], NEG_INF)  # (TN, C)
        m_old = m_ref[:, :1]
        m_new = jnp.maximum(m_old, jnp.max(sc, axis=1, keepdims=True))
        p = jnp.where(hot, jnp.exp(sc - m_new), 0.0)             # (TN, C)
        scale = jnp.exp(m_old - m_new)                           # (TN, 1)
        s_ref[...] = s_ref[...] * scale + jnp.sum(
            p, axis=1, keepdims=True)
        msgs = msgs_ref[...].astype(jnp.float32)
        hi = msgs.astype(jnp.bfloat16)
        lo = (msgs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pb = p.astype(jnp.bfloat16)
        acc_ref[...] = acc_ref[...] * scale + (
            jax.lax.dot(pb, hi, preferred_element_type=jnp.float32)
            + jax.lax.dot(pb, lo, preferred_element_type=jnp.float32))
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        s = s_ref[:, :1]
        out = jnp.where(s > 0, acc_ref[...] / jnp.maximum(s, 1e-20), 0.0)
        out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows", "chunk",
                                             "max_chunks", "n_nodes"))
def _gat_tiled(tile_offsets, senders, receivers, z, edge_scores, *,
               tile_rows: int, chunk: int, max_chunks: int, n_nodes: int):
    TN, C = tile_rows, chunk
    d = z.shape[1]
    num_tiles = tile_offsets.shape[0] - 1
    e_t = int(senders.shape[0])

    msgs = jnp.take(z, senders, axis=0)                  # (E_t, D)
    recv3d = receivers.reshape(e_t // C, 1, C)
    scores3d = edge_scores.reshape(e_t // C, 1, C)

    n_blocks = e_t // C

    def chunk_index(i, c, offs):
        # global clamp: empty trailing tiles would index past the end
        first = offs[i] // C
        last = jnp.maximum(offs[i + 1] // C - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, max_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, d), lambda i, c, offs: (chunk_index(i, c, offs), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, d), lambda i, c, offs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TN, 128), jnp.float32),
            pltpu.VMEM((TN, 128), jnp.float32),
            pltpu.VMEM((TN, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gat_kernel, TN=TN, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TN, d), z.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(tile_offsets, recv3d, scores3d, msgs)
    return out[:n_nodes]


def _edge_scores_tiled(t: TiledCSR, src_score, dst_score, negative_slope):
    """Per-edge raw scores in tiled edge order (XLA, cheap)."""
    s = jnp.take(src_score, t.senders, axis=0, mode="clip")
    r = jnp.take(dst_score, jnp.minimum(
        t.receivers, src_score.shape[0] - 1), axis=0)
    return jax.nn.leaky_relu(s + r, negative_slope)


def _xla_reference(graph: Graph, z, src_score, dst_score, negative_slope):
    from gist_tpu.ops.segment import segment_softmax, segment_weighted_sum
    scores = jnp.take(src_score, graph.senders, axis=0, mode="clip") + \
        jnp.take(dst_score, graph.receivers, axis=0, mode="clip")
    scores = jax.nn.leaky_relu(scores, negative_slope)
    alpha = segment_softmax(graph, scores)
    return segment_weighted_sum(graph, z, alpha)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gat_attention_pallas(graph: Graph, z, src_score, dst_score,
                         negative_slope: float = 0.01):
    """Fused single-head GAT aggregation.  ``src_score``/``dst_score``
    are per-node partial attention scores ((N,) each — z @ attn_l and
    z @ attn_r); the per-edge score, softmax, and weighted sum happen in
    one kernel pass over the tiled edges."""
    return _gat_forward(graph, z, src_score, dst_score, negative_slope)


def _gat_forward(graph, z, src_score, dst_score, negative_slope):
    if graph.tiled is None:
        raise NotImplementedError("graph built without tiles=True")
    t = graph.tiled
    scores = _edge_scores_tiled(t, src_score, dst_score, negative_slope)
    return _gat_tiled(t.tile_offsets, t.senders, t.receivers, z, scores,
                      tile_rows=t.tile_rows, chunk=t.chunk,
                      max_chunks=t.max_chunks, n_nodes=graph.n_nodes)


def _gat_fwd(graph, z, src_score, dst_score, negative_slope):
    out = _gat_forward(graph, z, src_score, dst_score, negative_slope)
    return out, (graph, z, src_score, dst_score)


def _gat_bwd(negative_slope, res, g):
    graph, z, src_score, dst_score = res
    _, vjp = jax.vjp(
        lambda z, a, b: _xla_reference(graph, z, a, b, negative_slope),
        z, src_score, dst_score)
    dz, da, db = vjp(g)
    return None, dz, da, db


gat_attention_pallas.defvjp(_gat_fwd, _gat_bwd)
