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

Gradients (round 2): a FUSED two-kernel backward.  With m/l (running
max / softmax denominator) saved by the forward, per-edge
probabilities are recomputable pointwise, and the softmax VJP
simplifies: ``ds_e = alpha_e * (dalpha_e - c_r) * lrelu'`` where
``c_r = out_r . G_r`` is per-node.  Kernel B1 (forward tiles) computes
``dalpha_e = z_src . G_r`` as an SDDMM via one NT matmul per chunk,
emits per-edge ds, and accumulates ddst per tile; kernel B2 (transpose
tiles, with ds re-ordered by the host-built ``pos_in_other`` gather)
accumulates ``dz = sum alpha G`` and dsrc — no scatter anywhere.  The
XLA-recompute backward is kept and selectable
(``set_gat_backward("xla")``) as the exact reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gist_tpu.graph import Graph, TiledCSR
from gist_tpu.ops.pallas_spmm import _split_hi_lo_dot

NEG_INF = -1e30


def _gat_kernel(tile_offsets_ref,   # SMEM scalar prefetch
                recv_ref,           # VMEM (1, 1, C)
                scores_ref,         # VMEM (1, 1, C)
                msgs_ref,           # VMEM (C, D)
                out_ref,            # VMEM (TN, D) revisited per tile
                m_out_ref,          # VMEM (TN, 128) final running max
                l_out_ref,          # VMEM (TN, 128) final denominator
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
        pb = p.astype(jnp.bfloat16)
        # bf16 messages skip the lo matmul (_split_hi_lo_dot)
        acc_ref[...] = acc_ref[...] * scale + _split_hi_lo_dot(
            pb, msgs_ref[...])
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        s = s_ref[:, :1]
        out = jnp.where(s > 0, acc_ref[...] / jnp.maximum(s, 1e-20), 0.0)
        out_ref[...] = out.astype(out_ref.dtype)
        m_out_ref[...] = m_ref[...]
        l_out_ref[...] = s_ref[...]


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
        out_specs=(
            pl.BlockSpec((TN, d), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, 128), jnp.float32),
            pltpu.VMEM((TN, 128), jnp.float32),
            pltpu.VMEM((TN, d), jnp.float32),
        ],
    )
    out, m_full, l_full = pl.pallas_call(
        functools.partial(_gat_kernel, TN=TN, C=C),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * TN, d), z.dtype),
            jax.ShapeDtypeStruct((num_tiles * TN, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * TN, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(tile_offsets, recv3d, scores3d, msgs)
    return out[:n_nodes], m_full[:, 0], l_full[:, 0]


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
    out, _, _ = _gat_forward(graph, z, src_score, dst_score,
                             negative_slope)
    return out


def _gat_forward(graph, z, src_score, dst_score, negative_slope):
    if graph.tiled is None:
        raise NotImplementedError("graph built without tiles=True")
    t = graph.tiled
    scores = _edge_scores_tiled(t, src_score, dst_score, negative_slope)
    out, m, l = _gat_tiled(t.tile_offsets, t.senders, t.receivers, z,
                           scores, tile_rows=t.tile_rows, chunk=t.chunk,
                           max_chunks=t.max_chunks, n_nodes=graph.n_nodes)
    return out, m, l


def _gat_fwd(graph, z, src_score, dst_score, negative_slope):
    out, m, l = _gat_forward(graph, z, src_score, dst_score, negative_slope)
    return out, (graph, z, src_score, dst_score, out, m, l)


_GAT_BACKWARD = "fused"


def set_gat_backward(mode: str) -> None:
    """``"fused"`` (default): the two-kernel scatter-free backward;
    ``"xla"``: recompute attention with the XLA composite and
    differentiate it (exact, used as the reference in tests)."""
    global _GAT_BACKWARD
    assert mode in ("fused", "xla"), mode
    _GAT_BACKWARD = mode


def _gat_bwd(negative_slope, res, g):
    graph, z, src_score, dst_score, out, m, l = res
    if (_GAT_BACKWARD == "fused" and graph.tiled is not None
            and graph.tiled_t is not None
            and graph.tiled.pos_in_other is not None):
        return _gat_backward_fused(graph, z, src_score, dst_score, out,
                                   m, l, g, negative_slope)
    _, vjp = jax.vjp(
        lambda z, a, b: _xla_reference(graph, z, a, b, negative_slope),
        z, src_score, dst_score)
    dz, da, db = vjp(g)
    return None, dz, da, db


gat_attention_pallas.defvjp(_gat_fwd, _gat_bwd)


# ---------------------------------------------------------------------------
# Fused backward kernels
# ---------------------------------------------------------------------------


def _gat_bwd_b1_kernel(tile_offsets_ref,
                       recv_ref,       # (1, 1, C) global receiver ids
                       alpha_ref,      # (1, 1, C) per-edge probabilities
                       gprime_ref,     # (1, 1, C) leaky-relu gradient
                       zmsgs_ref,      # (C, D) z rows gathered by sender
                       g_ref,          # (TN, D) upstream grad, block (i,0)
                       c_ref,          # (TN, 128) out.G rowdot, block (i,0)
                       ds_ref,         # OUT (1, 1, C) per-edge score grad
                       ddst_ref,       # OUT (TN, 128) per-tile sum
                       acc_ref,        # scratch (TN, 128)
                       *, TN: int, C: int):
    i = pl.program_id(0)
    c = pl.program_id(1)
    nchunks = (tile_offsets_ref[i + 1] - tile_offsets_ref[i]) // C

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(c < nchunks)
    def _():
        local = recv_ref[0, 0].astype(jnp.int32) - i * TN        # (C,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TN, C), 0)
        hot = rows == local[None, :]
        # SDDMM: dalpha_e = z_src(e) . G_r(e) for r in this tile, via one
        # NT matmul (G_tile hi/lo for fp32 accuracy, z bf16)
        gt = g_ref[...].astype(jnp.float32)
        ghi = gt.astype(jnp.bfloat16)
        glo = (gt - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
        zb = zmsgs_ref[...].astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        MT = (jax.lax.dot_general(ghi, zb, dn,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(glo, zb, dn,
                                    preferred_element_type=jnp.float32))
        dalpha = jnp.sum(jnp.where(hot, MT, 0.0), axis=0)        # (C,)
        c_col = c_ref[:, :1]                                     # (TN, 1)
        c_e = jnp.sum(jnp.where(hot, c_col, 0.0), axis=0)        # (C,)
        ds = (alpha_ref[0, 0] * (dalpha - c_e) * gprime_ref[0, 0])
        ds_ref[0, 0] = ds
        acc_ref[:, :1] += jnp.sum(
            jnp.where(hot, ds[None, :], 0.0), axis=1, keepdims=True)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        ddst_ref[...] = acc_ref[...]


def _gat_bwd_b2_kernel(tile_offsets_ref,
                       recv_ref,       # (1, 1, C) global SENDER ids (t)
                       alpha_ref,      # (1, 1, C) alpha in transpose order
                       ds_ref,         # (1, 1, C) ds in transpose order
                       gmsgs_ref,      # (C, D) G rows gathered by orig recv
                       dz_ref,         # OUT (TN, D)
                       dsrc_ref,       # OUT (TN, 128)
                       accz_ref,       # scratch (TN, D)
                       accs_ref,       # scratch (TN, 128)
                       *, TN: int, C: int):
    i = pl.program_id(0)
    c = pl.program_id(1)
    nchunks = (tile_offsets_ref[i + 1] - tile_offsets_ref[i]) // C

    @pl.when(c == 0)
    def _():
        accz_ref[...] = jnp.zeros_like(accz_ref)
        accs_ref[...] = jnp.zeros_like(accs_ref)

    @pl.when(c < nchunks)
    def _():
        local = recv_ref[0, 0].astype(jnp.int32) - i * TN
        rows = jax.lax.broadcasted_iota(jnp.int32, (TN, C), 0)
        hot = rows == local[None, :]
        wa = jnp.where(hot, alpha_ref[0, 0][None, :], 0.0) \
            .astype(jnp.bfloat16)
        gm = gmsgs_ref[...].astype(jnp.float32)
        hi = gm.astype(jnp.bfloat16)
        lo = (gm - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        accz_ref[...] += (
            jax.lax.dot(wa, hi, preferred_element_type=jnp.float32)
            + jax.lax.dot(wa, lo, preferred_element_type=jnp.float32))
        accs_ref[:, :1] += jnp.sum(
            jnp.where(hot, ds_ref[0, 0][None, :], 0.0), axis=1,
            keepdims=True)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        dz_ref[...] = accz_ref[...].astype(dz_ref.dtype)
        dsrc_ref[...] = accs_ref[...]


def _chunk_blocks(t: TiledCSR):
    """(chunk_index fn, n_blocks_with_dummy) for per-chunk OUTPUT blocks:
    empty tiles clamp to a dummy trailing block so their garbage flushes
    never land on a real chunk."""
    e_t = int(t.senders.shape[0])
    C = t.chunk
    n_blocks = e_t // C

    def chunk_index(i, c, offs):
        first = offs[i] // C
        last = jnp.maximum(offs[i + 1] // C - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_blocks)

    return chunk_index, n_blocks


def _edge_alpha(t: TiledCSR, src_score, dst_score, m, l, negative_slope,
                n_pad_rows: int):
    """Per-edge probabilities in this layout's tiled order, recomputed
    pointwise from the saved running max / denominator.  ``senders``
    here must be the ORIGINAL-graph sender array of the layout."""
    snd = jnp.minimum(t.senders, src_score.shape[0] - 1)
    rcv = jnp.minimum(t.receivers, n_pad_rows - 1)
    raw = jnp.take(src_score, snd, axis=0) + \
        jnp.take(dst_score, jnp.minimum(t.receivers,
                                        dst_score.shape[0] - 1), axis=0)
    score = jax.nn.leaky_relu(raw, negative_slope)
    mg = jnp.take(m, rcv, axis=0)
    lg = jnp.take(l, rcv, axis=0)
    # score - m <= 0 for every real edge (m is the row max); the clamp
    # only kills exp overflow on padding slots gathering m = -inf rows
    alpha = jnp.where(
        lg > 0,
        jnp.exp(jnp.minimum(score - mg, 0.0)) / jnp.maximum(lg, 1e-20),
        0.0)
    gprime = jnp.where(raw > 0, 1.0, negative_slope)
    return raw, alpha, gprime


@functools.partial(jax.jit, static_argnames=("negative_slope",))
def _gat_backward_fused(graph, z, src_score, dst_score, out, m, l, g,
                        negative_slope):
    tf = graph.tiled
    tt = graph.tiled_t
    TN, C = tf.tile_rows, tf.chunk
    n = graph.n_nodes
    d = z.shape[1]
    num_tiles = tf.num_tiles
    pad_rows = num_tiles * TN

    # node-level: pad G/out to tile rows; c_r = out_r . G_r
    g_pad = jnp.pad(g.astype(jnp.float32), ((0, pad_rows - n), (0, 0)))
    c_rows = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                     axis=1)
    c_pad = jnp.pad(c_rows, (0, pad_rows - n))
    c128 = jnp.broadcast_to(c_pad[:, None], (pad_rows, 128))

    # ---- B1 on forward tiles: ds per edge + ddst per node -------------
    _, alpha_f, gprime_f = _edge_alpha(tf, src_score, dst_score, m, l,
                                       negative_slope, pad_rows)
    e_f = int(tf.senders.shape[0])
    zmsgs = jnp.take(z, tf.senders, axis=0)
    chunk_index_f, nb_f = _chunk_blocks(tf)
    pad_blk = ((0, C), )

    recv_f = jnp.concatenate(
        [tf.receivers, jnp.full((C,), pad_rows, tf.receivers.dtype)])
    alpha_fp = jnp.concatenate([alpha_f, jnp.zeros((C,), alpha_f.dtype)])
    gprime_fp = jnp.concatenate([gprime_f, jnp.zeros((C,),
                                                     gprime_f.dtype)])
    zmsgs_p = jnp.concatenate([zmsgs, jnp.zeros((C, d), zmsgs.dtype)])

    grid_spec_b1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, tf.max_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index_f(i, c, offs),
                                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index_f(i, c, offs),
                                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index_f(i, c, offs),
                                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, d),
                         lambda i, c, offs: (chunk_index_f(i, c, offs), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, d), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index_f(i, c, offs),
                                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((TN, 128), jnp.float32)],
    )
    ds3d, ddst128 = pl.pallas_call(
        functools.partial(_gat_bwd_b1_kernel, TN=TN, C=C),
        grid_spec=grid_spec_b1,
        out_shape=(
            jax.ShapeDtypeStruct((nb_f + 1, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((pad_rows, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tf.tile_offsets,
      recv_f.reshape(nb_f + 1, 1, C),
      alpha_fp.reshape(nb_f + 1, 1, C),
      gprime_fp.reshape(nb_f + 1, 1, C),
      zmsgs_p, g_pad, c128)
    ds_f = ds3d.reshape(-1)[:e_f]
    ddst = ddst128[:n, 0]

    # ---- B2 on transpose tiles: dz per node + dsrc per node -----------
    # transpose layout: `senders` = original receivers, `receivers` =
    # original senders (the grouping key)
    tt_num_tiles = tt.num_tiles
    tt_pad_rows = tt_num_tiles * TN
    _, alpha_t, _ = _edge_alpha(
        tt.replace(senders=tt.receivers, receivers=tt.senders),
        src_score, dst_score, m, l, negative_slope, pad_rows)
    ds_t = jnp.take(ds_f, jnp.minimum(tt.pos_in_other, e_f - 1), axis=0)
    # padding slots map to position 0; kill them via the alpha mask
    valid_t = tt.receivers < tt_pad_rows
    alpha_t = jnp.where(valid_t, alpha_t, 0.0)
    ds_t = jnp.where(valid_t, ds_t, 0.0)

    e_t = int(tt.senders.shape[0])
    gmsgs = jnp.take(g_pad, jnp.minimum(tt.senders, pad_rows - 1), axis=0)
    chunk_index_t, nb_t = _chunk_blocks(tt)
    recv_t = jnp.concatenate(
        [tt.receivers, jnp.full((C,), tt_pad_rows, tt.receivers.dtype)])
    alpha_tp = jnp.concatenate([alpha_t, jnp.zeros((C,), alpha_t.dtype)])
    ds_tp = jnp.concatenate([ds_t, jnp.zeros((C,), ds_t.dtype)])
    gmsgs_p = jnp.concatenate([gmsgs, jnp.zeros((C, d), gmsgs.dtype)])

    grid_spec_b2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tt_num_tiles, tt.max_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index_t(i, c, offs),
                                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index_t(i, c, offs),
                                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C),
                         lambda i, c, offs: (chunk_index_t(i, c, offs),
                                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, d),
                         lambda i, c, offs: (chunk_index_t(i, c, offs), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TN, d), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((TN, d), jnp.float32),
                        pltpu.VMEM((TN, 128), jnp.float32)],
    )
    dz_pad, dsrc128 = pl.pallas_call(
        functools.partial(_gat_bwd_b2_kernel, TN=TN, C=C),
        grid_spec=grid_spec_b2,
        out_shape=(
            jax.ShapeDtypeStruct((tt_pad_rows, d), z.dtype),
            jax.ShapeDtypeStruct((tt_pad_rows, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tt.tile_offsets,
      recv_t.reshape(nb_t + 1, 1, C),
      alpha_tp.reshape(nb_t + 1, 1, C),
      ds_tp.reshape(nb_t + 1, 1, C),
      gmsgs_p)
    dz = dz_pad[:n]
    dsrc = dsrc128[:n, 0]
    return None, dz, dsrc.astype(src_score.dtype), \
        ddst.astype(dst_score.dtype)


# ---------------------------------------------------------------------------
# Dedup-layout fused attention (round 4)
#
# The v1 kernel above reads one gathered message row PER EDGE plus a
# precomputed per-edge score array.  GAT scores are rank-1 in the node
# scores (e(r,u) = lrelu(src[u] + dst[r])), so on the block-dense dedup
# layout (gist_tpu.graph.DedupTiles — each dst tile lists its unique
# senders once, adjacency as int8 count blocks) NO per-edge data is
# needed at all: per job the kernel rebuilds the (TN, CU) score block
# from a gathered unique-sender score lane vector and the tile's dst
# score column, masks it with the count block (counts multiply the
# probabilities — parallel edges share a score), and runs the same
# online softmax as v1 with the matmul over |unique| rows instead of E
# rows.  HBM traffic drops to ~d = |unique|/E of the v1 message
# traffic (the same ~0.35 factor that makes the dedup SpMM 6x).
#
# The dst column trick: a (1, 128) lane vector can't broadcast over
# sublanes directly; one masked NT matmul against an iota identity
# (hi/lo split for fp32 exactness) recovers the (TN, 1) column on the
# MXU — done once per tile at c == 0 into scratch.
# ---------------------------------------------------------------------------


def _gat_dedup_kernel(job_offsets_ref,  # SMEM (num_tiles+1,) prefetch
                      dst_ref,          # VMEM (1, 1, 128) dst scores (tile i)
                      w_ref,            # VMEM (1, TN, CU) int8 count block
                      usc_ref,          # VMEM (1, 1, H*CU) unique src scores
                      u_ref,            # VMEM (CU, H*DP) unique z rows
                      out_ref,          # VMEM (TN, H*DP) revisited per tile
                      m_out_ref,        # VMEM (TN, H*128) final running max
                      l_out_ref,        # VMEM (TN, H*128) final denominator
                      dcol_ref,         # scratch (TN, H*128) dst columns
                      m_ref,            # scratch (TN, H*128) running max
                      s_ref,            # scratch (TN, H*128) running denom
                      acc_ref,          # scratch (TN, H*DP) fp32
                      *, TN: int, CU: int, negative_slope: float,
                      H: int, DP: int):
    # Multi-head batched (round 4): the w block is read ONCE per job for
    # all H heads, and the caller gathers one (CU, H*DP) unique-row
    # block instead of H separate gathers; head h lives in lane slices
    # [h*CU:(h+1)*CU] (scores), [h*DP:(h+1)*DP] (rows/acc), and
    # [h*128:(h+1)*128] (dst/m/s).  H=1 is the single-head kernel.
    i = pl.program_id(0)
    c = pl.program_id(1)
    njobs = job_offsets_ref[i + 1] - job_offsets_ref[i]

    @pl.when(c == 0)
    def _():
        for h in range(H):
            dcol_ref[:, h * 128:(h + 1) * 128] = _dst_col(dst_ref, TN, h)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(c < njobs)
    def _():
        w = w_ref[0].astype(jnp.float32)                        # (TN, CU)
        for h in range(H):
            raw = (dcol_ref[:, h * 128:h * 128 + 1]
                   + usc_ref[0, 0, h * CU:(h + 1) * CU][None, :])
            e = jnp.where(raw > 0, raw, negative_slope * raw)
            e = jnp.where(w > 0, e, NEG_INF)
            m_old = m_ref[:, h * 128:h * 128 + 1]
            m_new = jnp.maximum(m_old, jnp.max(e, axis=1, keepdims=True))
            # counts multiply: k parallel edges give k * exp(score)
            p = jnp.where(w > 0, w * jnp.exp(e - m_new), 0.0)
            scale = jnp.exp(m_old - m_new)                      # (TN, 1)
            s_ref[:, h * 128:(h + 1) * 128] = (
                s_ref[:, h * 128:(h + 1) * 128] * scale
                + jnp.sum(p, axis=1, keepdims=True))
            pb = p.astype(jnp.bfloat16)
            # bf16 messages skip the lo matmul (_split_hi_lo_dot)
            acc_ref[:, h * DP:(h + 1) * DP] = (
                acc_ref[:, h * DP:(h + 1) * DP] * scale
                + _split_hi_lo_dot(pb, u_ref[:, h * DP:(h + 1) * DP]))
            m_ref[:, h * 128:(h + 1) * 128] = jnp.broadcast_to(
                m_new, (TN, 128))

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        for h in range(H):
            s = s_ref[:, h * 128:h * 128 + 1]
            acc = acc_ref[:, h * DP:(h + 1) * DP]
            out = jnp.where(s > 0, acc / jnp.maximum(s, 1e-20), 0.0)
            out_ref[:, h * DP:(h + 1) * DP] = out.astype(out_ref.dtype)
        m_out_ref[...] = m_ref[...]
        l_out_ref[...] = s_ref[...]


@functools.partial(jax.jit, static_argnames=("tile_rows", "cu", "max_jobs",
                                             "negative_slope", "heads"))
def _gat_dedup_call(job_offsets, dst_tiles, w_blocks, u_scores, u_rows, *,
                    tile_rows: int, cu: int, max_jobs: int,
                    negative_slope: float, heads: int = 1):
    """``u_rows`` is (jobs*CU, H*DP) with head h in lane slice
    [h*DP:(h+1)*DP]; ``u_scores`` (jobs, 1, H*CU); ``dst_tiles``
    (tiles, 1, H*128).  H=1 reduces to the single-head layout."""
    TN, CU, H = tile_rows, cu, heads
    hd = u_rows.shape[1]
    assert hd % H == 0
    DP = hd // H
    num_tiles = job_offsets.shape[0] - 1
    n_jobs_total = w_blocks.shape[0]

    def job_index(i, c, offs):
        # clamp into the tile's job range (skipped steps repeat the
        # previous block index so the pipeline elides the re-fetch)
        first = offs[i]
        last = jnp.maximum(offs[i + 1] - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_jobs_total - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, max_jobs),
        in_specs=[
            pl.BlockSpec((1, 1, H * 128), lambda i, c, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, CU),
                         lambda i, c, offs: (job_index(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H * CU),
                         lambda i, c, offs: (job_index(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CU, H * DP),
                         lambda i, c, offs: (job_index(i, c, offs), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TN, H * DP), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, H * 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, H * 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TN, H * 128), jnp.float32),
            pltpu.VMEM((TN, H * 128), jnp.float32),
            pltpu.VMEM((TN, H * 128), jnp.float32),
            pltpu.VMEM((TN, H * DP), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gat_dedup_kernel, TN=TN, CU=CU,
                          negative_slope=negative_slope, H=H, DP=DP),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * TN, H * DP), u_rows.dtype),
            jax.ShapeDtypeStruct((num_tiles * TN, H * 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * TN, H * 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_jobs_total * TN * CU * hd,
            bytes_accessed=(n_jobs_total * (TN * CU + CU * hd * 4
                                            + H * CU * 4)
                            + num_tiles * TN * hd * 4),
            transcendentals=n_jobs_total * TN * CU * H,
        ),
    )(job_offsets, dst_tiles, w_blocks, u_scores, u_rows)


def _gat_forward_dedup(graph, z, src_score, dst_score, negative_slope):
    """Fused attention over the dedup layout.  Returns (out, m, l) with
    m/l per PERMUTED tile row (the layout's kernel output order)."""
    t = graph.dedup
    TN, CU = t.tile_rows, t.cu
    num_tiles = t.num_tiles
    pad_rows = num_tiles * TN
    n = graph.n_nodes
    if t.perm is not None:
        # u_senders hold permuted ids: reorder the gather sources once
        z_p = jnp.take(z, t.perm, axis=0)
        src_p = jnp.take(src_score, t.perm, axis=0)
    else:
        z_p, src_p = z, src_score
    u_rows = jnp.take(z_p, t.u_senders, axis=0)           # (jobs*CU, D)
    n_jobs = u_rows.shape[0] // CU
    u_scores = jnp.take(src_p, t.u_senders,
                        axis=0).reshape(n_jobs, 1, CU).astype(jnp.float32)
    # dst scores in KERNEL OUTPUT ROW order — pos maps node -> row and
    # can be set without perm (raw-id gathers, permuted output rows)
    if t.pos is not None:
        dst_pad = jnp.zeros(pad_rows, jnp.float32) \
            .at[t.pos].set(dst_score.astype(jnp.float32))
    else:
        dst_pad = jnp.pad(dst_score.astype(jnp.float32), (0, pad_rows - n))
    dst_tiles = dst_pad.reshape(num_tiles, TN)
    if TN < 128:
        dst_tiles = jnp.pad(dst_tiles, ((0, 0), (0, 128 - TN)))
    dst_tiles = dst_tiles.reshape(num_tiles, 1, 128)
    out, m, l = _gat_dedup_call(
        t.job_offsets, dst_tiles, t.w_blocks, u_scores, u_rows,
        tile_rows=TN, cu=CU, max_jobs=t.max_jobs,
        negative_slope=negative_slope)
    if t.pos is not None:
        out = jnp.take(out, t.pos, axis=0)
    else:
        out = out[:n]
    return out, m[:, 0], l[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gat_attention_dedup(graph: Graph, z, src_score, dst_score,
                        negative_slope: float = 0.01):
    """Fused single-head GAT aggregation over the block-dense dedup
    layout (``graph.dedup``) — no per-edge arrays in the forward; the
    message matmul runs over unique sender rows.  Semantics identical
    to :func:`gat_attention_pallas` / the XLA composite."""
    out, _, _ = _gat_forward_dedup(graph, z, src_score, dst_score,
                                   negative_slope)
    return out


def _gat_dedup_fwd(graph, z, src_score, dst_score, negative_slope):
    out, m, l = _gat_forward_dedup(graph, z, src_score, dst_score,
                                   negative_slope)
    return out, (graph, z, src_score, dst_score, out, m, l)


def _gat_dedup_bwd(negative_slope, res, g):
    graph, z, src_score, dst_score, out, m, l = res
    if _GAT_BACKWARD == "fused" and graph.dedup_t is not None:
        return _gat_dedup_backward_fused(graph, z, src_score, dst_score,
                                         out, m, l, g, negative_slope)
    # exact recompute through the XLA composite (graph.senders carries
    # the real edge list on every training graph)
    _, vjp = jax.vjp(
        lambda z, a, b: _xla_reference(graph, z, a, b, negative_slope),
        z, src_score, dst_score)
    dz, da, db = vjp(g)
    return None, dz, da, db


gat_attention_dedup.defvjp(_gat_dedup_fwd, _gat_dedup_bwd)


def _mh_tiles_forward(t, n: int, z, src_score, dst_score, negative_slope):
    """Multi-head batched forward over a bare DedupTiles layout:
    z (n, H, O), src/dst (n, H) -> (out (n, H, O) NORMALIZED over the
    layout's edges, m_rows (n, H), l_rows (n, H)) — the per-row
    running max / denominator let callers MERGE this partial softmax
    with other edge populations (the sharded interior/boundary split:
    parallel/layers.py)."""
    out, m, l = _mh_tiles_raw(t, n, z, src_score, dst_score,
                              negative_slope)
    # per-row per-head columns: head h's lane block starts at h*128
    m_rows, l_rows = m[:, ::128], l[:, ::128]
    if t.pos is not None:
        m_rows = jnp.take(m_rows, t.pos, axis=0)
        l_rows = jnp.take(l_rows, t.pos, axis=0)
    else:
        m_rows, l_rows = m_rows[:n], l_rows[:n]
    return out, m_rows, l_rows


def _gat_forward_dedup_mh(graph, z, src_score, dst_score, negative_slope):
    """Multi-head batched forward: z (N, H, O), src/dst (N, H) ->
    (out (N, H, O), m (pad_rows, H*128), l (pad_rows, H*128)).  One
    unique-row gather and one w-block read per job serve every head."""
    return _mh_tiles_raw(graph.dedup, graph.n_nodes, z, src_score,
                         dst_score, negative_slope)


def _mh_tiles_raw(t, n, z, src_score, dst_score, negative_slope):
    TN, CU = t.tile_rows, t.cu
    num_tiles = t.num_tiles
    pad_rows = num_tiles * TN
    H, O = z.shape[1], z.shape[2]
    DP = -(-O // 128) * 128
    if DP != O:
        z_flat = jnp.pad(z, ((0, 0), (0, 0), (0, DP - O)))
    else:
        z_flat = z
    z_flat = z_flat.reshape(z.shape[0], H * DP)
    if t.perm is not None:
        z_p = jnp.take(z_flat, t.perm, axis=0)
        src_p = jnp.take(src_score, t.perm, axis=0)
    else:
        z_p, src_p = z_flat, src_score
    u_rows = jnp.take(z_p, t.u_senders, axis=0)       # (jobs*CU, H*DP)
    n_jobs = u_rows.shape[0] // CU
    # per-head score lanes contiguous: (jobs, CU, H) -> (jobs, H, CU)
    u_scores = (jnp.take(src_p, t.u_senders, axis=0)
                .reshape(n_jobs, CU, H).transpose(0, 2, 1)
                .reshape(n_jobs, 1, H * CU).astype(jnp.float32))
    if t.pos is not None:
        dst_rows = jnp.zeros((pad_rows, H), jnp.float32) \
            .at[t.pos].set(dst_score.astype(jnp.float32))
    else:
        dst_rows = jnp.pad(dst_score.astype(jnp.float32),
                           ((0, pad_rows - n), (0, 0)))
    dst_tiles = dst_rows.reshape(num_tiles, TN, H).transpose(0, 2, 1)
    if TN < 128:
        dst_tiles = jnp.pad(dst_tiles, ((0, 0), (0, 0), (0, 128 - TN)))
    dst_tiles = dst_tiles.reshape(num_tiles, 1, H * 128)
    out, m, l = _gat_dedup_call(
        t.job_offsets, dst_tiles, t.w_blocks, u_scores, u_rows,
        tile_rows=TN, cu=CU, max_jobs=t.max_jobs,
        negative_slope=negative_slope, heads=H)
    out = out.reshape(pad_rows, H, DP)[:, :, :O]
    if t.pos is not None:
        out = jnp.take(out, t.pos, axis=0)
    else:
        out = out[:n]
    return out, m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gat_attention_dedup_mh(graph: Graph, z, src_score, dst_score,
                           negative_slope: float = 0.01):
    """All-heads fused dedup attention: ``z`` (N, H, O), per-node score
    halves ``src_score``/``dst_score`` (N, H) -> (N, H, O).  Semantics
    = per-head :func:`gat_attention_dedup`, but the unique-row gather
    and count-block reads are shared across heads."""
    out, _, _ = _gat_forward_dedup_mh(graph, z, src_score, dst_score,
                                      negative_slope)
    return out


def _gat_dedup_mh_fwd(graph, z, src_score, dst_score, negative_slope):
    out, m, l = _gat_forward_dedup_mh(graph, z, src_score, dst_score,
                                      negative_slope)
    return out, (graph, z, src_score, dst_score, out, m, l)


def _gat_dedup_mh_bwd(negative_slope, res, g):
    graph, z, src_score, dst_score, out, m, l = res
    H = z.shape[1]
    dzs, dsrcs, ddsts = [], [], []
    if _GAT_BACKWARD == "fused" and graph.dedup_t is not None:
        for h in range(H):
            _, dz, da, db = _gat_dedup_backward_fused(
                graph, z[:, h], src_score[:, h], dst_score[:, h],
                out[:, h], m[:, h * 128], l[:, h * 128], g[:, h],
                negative_slope)
            dzs.append(dz)
            dsrcs.append(da)
            ddsts.append(db)
    else:
        for h in range(H):
            _, vjp = jax.vjp(
                lambda zz, a, b: _xla_reference(graph, zz, a, b,
                                                negative_slope),
                z[:, h], src_score[:, h], dst_score[:, h])
            dz, da, db = vjp(g[:, h])
            dzs.append(dz)
            dsrcs.append(da)
            ddsts.append(db)
    return (None, jnp.stack(dzs, axis=1), jnp.stack(dsrcs, axis=1),
            jnp.stack(ddsts, axis=1))


gat_attention_dedup_mh.defvjp(_gat_dedup_mh_fwd, _gat_dedup_mh_bwd)


# ---------------------------------------------------------------------------
# Chunked dedup attention (round 5): graphs whose gathered unique rows
# exceed HBM in one shot — the full-Reddit-scale (115M-edge) full-graph
# GAT eval (VERDICT r4 missing #5).  Reuses the SpMM ChunkedDedupTiles
# layout verbatim (graph.dedup_c): chunks partition DESTINATION tiles,
# so every destination's entire incoming-edge softmax lives inside one
# chunk — no cross-chunk partial-softmax merge is needed (unlike the
# sharded interior/boundary split in parallel/layers.py).
# ---------------------------------------------------------------------------


def _mh_tiles_raw_chunked(t, n, z, src_score, dst_score, negative_slope):
    """Multi-head batched forward over a ChunkedDedupTiles layout:
    z (n, H, O), src/dst (n, H) -> (out (n-trimmed padded rows, H, DP),
    m, l) like :func:`_mh_tiles_raw`.  ``lax.scan`` serializes the
    chunks so only ONE chunk's gathered unique rows are live — an
    unrolled loop lets XLA schedule chunks concurrently and blows HBM
    at 100M-edge scale (see pallas_spmm._run_dedup_chunked)."""
    TN, CU = t.tile_rows, t.cu
    tpc = t.tiles_per_chunk
    pad_rows = t.n_chunks * tpc * TN
    H, O = z.shape[1], z.shape[2]
    DP = -(-O // 128) * 128
    if DP != O:
        z_flat = jnp.pad(z, ((0, 0), (0, 0), (0, DP - O)))
    else:
        z_flat = z
    z_flat = z_flat.reshape(z.shape[0], H * DP)
    if t.perm is not None:     # chunked layouts always permute_u
        z_p = jnp.take(z_flat, t.perm, axis=0)
        src_p = jnp.take(src_score, t.perm, axis=0)
    else:
        z_p, src_p = z_flat, src_score
    if t.pos is not None:
        dst_rows = jnp.zeros((pad_rows, H), jnp.float32) \
            .at[t.pos].set(dst_score.astype(jnp.float32))
    else:
        dst_rows = jnp.pad(dst_score.astype(jnp.float32),
                           ((0, pad_rows - n), (0, 0)))
    dst_tiles = dst_rows.reshape(t.n_chunks, tpc, TN, H) \
        .transpose(0, 1, 3, 2)
    if TN < 128:
        dst_tiles = jnp.pad(dst_tiles,
                            ((0, 0), (0, 0), (0, 0), (0, 128 - TN)))
    dst_tiles = dst_tiles.reshape(t.n_chunks, tpc, 1, H * 128)
    jobs_pad = t.w_blocks.shape[1]
    max_jobs = min(t.max_jobs, jobs_pad)

    def body(_, chunk):
        offs, w, u_idx, dtiles = chunk
        u_rows = jnp.take(z_p, u_idx, axis=0)        # (jobs_pad*CU, H*DP)
        u_scores = (jnp.take(src_p, u_idx, axis=0)
                    .reshape(jobs_pad, CU, H).transpose(0, 2, 1)
                    .reshape(jobs_pad, 1, H * CU).astype(jnp.float32))
        out_c, m_c, l_c = _gat_dedup_call(
            offs, dtiles, w, u_scores, u_rows, tile_rows=TN, cu=CU,
            max_jobs=max_jobs, negative_slope=negative_slope, heads=H)
        return None, (out_c, m_c, l_c)

    _, (outs, ms, ls) = jax.lax.scan(
        body, None, (t.job_offsets, t.w_blocks, t.u_senders, dst_tiles))
    out = outs.reshape(pad_rows, H, DP)[:, :, :O]
    m = ms.reshape(pad_rows, H * 128)
    l = ls.reshape(pad_rows, H * 128)
    if t.pos is not None:
        out = jnp.take(out, t.pos, axis=0)
    else:
        out = out[:n]
    return out, m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gat_attention_dedup_chunked(graph: Graph, z, src_score, dst_score,
                                negative_slope: float = 0.01):
    """All-heads fused dedup attention over the CHUNKED layout
    (``graph.dedup_c``): z (N, H, O), scores (N, H) -> (N, H, O).
    Semantics = :func:`gat_attention_dedup_mh`; memory bounded to one
    chunk's gathered rows, so full-graph attention runs at 100M+ edge
    scale on one chip.  Backward falls back to the exact XLA composite
    recompute per head (full-graph GAT at this scale is an EVAL path —
    the reference trains GAT only via bounded cluster batches,
    script/reddit/run_gat_distrib_sweep.py:8-15)."""
    out, _, _ = _mh_tiles_raw_chunked(graph.dedup_c, graph.n_nodes, z,
                                      src_score, dst_score,
                                      negative_slope)
    return out


def _gat_dedup_chunked_fwd(graph, z, src_score, dst_score,
                           negative_slope):
    out, _, _ = _mh_tiles_raw_chunked(graph.dedup_c, graph.n_nodes, z,
                                      src_score, dst_score,
                                      negative_slope)
    return out, (graph, z, src_score, dst_score)


def _gat_dedup_chunked_bwd(negative_slope, res, g):
    graph, z, src_score, dst_score = res
    H = z.shape[1]
    dzs, dsrcs, ddsts = [], [], []
    for h in range(H):
        _, vjp = jax.vjp(
            lambda zz, a, b: _xla_reference(graph, zz, a, b,
                                            negative_slope),
            z[:, h], src_score[:, h], dst_score[:, h])
        dz, da, db = vjp(g[:, h])
        dzs.append(dz)
        dsrcs.append(da)
        ddsts.append(db)
    return (None, jnp.stack(dzs, axis=1), jnp.stack(dsrcs, axis=1),
            jnp.stack(ddsts, axis=1))


gat_attention_dedup_chunked.defvjp(_gat_dedup_chunked_fwd,
                                   _gat_dedup_chunked_bwd)


# ---------------------------------------------------------------------------
# Fused dedup backward (round 4): two kernels, both structurally the
# forward dedup kernel plus one NT SDDMM matmul.  All per-edge
# quantities (alpha, score gradient ds) are recomputed BLOCKWISE from
# per-node vectors and the saved running max / denominator — unlike the
# v1 fused backward there is no per-edge ds array shipped between the
# kernels; each kernel derives what it needs in its own orientation:
#
#   B1 (forward tiles, dst rows):   ddst_r = sum_u ds(r,u)
#   B2 (transpose tiles, src rows): dz_s   = sum_r A(s,r) G_r
#                                   dsrc_s = sum_r ds(s,r)
#
# with A the count-weighted probability block and
# ds = A * (dalpha - c_r) * lrelu', dalpha = z_u . G_r (one NT matmul).
# ---------------------------------------------------------------------------


def _gat_dedup_bwd_b1_kernel(job_offsets_ref,
                             dst_ref,    # (1, 1, 128) dst scores (tile)
                             w_ref,      # (1, TN, CU) int8
                             usc_ref,    # (1, 1, CU) unique src scores
                             u_ref,      # (CU, D) unique z rows
                             g_ref,      # (TN, D) upstream grad (tile)
                             m_ref,      # (TN, 128) fwd running max (tile)
                             l_ref,      # (TN, 128) fwd denominator (tile)
                             c_ref,      # (TN, 128) out.G rowdot (tile)
                             ddst_ref,   # OUT (TN, 128)
                             dcol_ref,   # scratch (TN, 128)
                             acc_ref,    # scratch (TN, 128)
                             *, TN: int, CU: int, negative_slope: float):
    i = pl.program_id(0)
    c = pl.program_id(1)
    njobs = job_offsets_ref[i + 1] - job_offsets_ref[i]

    @pl.when(c == 0)
    def _():
        dcol_ref[...] = _dst_col(dst_ref, TN)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(c < njobs)
    def _():
        w = w_ref[0].astype(jnp.float32)
        raw = dcol_ref[:, :1] + usc_ref[0, 0][None, :]
        e = jnp.where(raw > 0, raw, negative_slope * raw)
        gprime = jnp.where(raw > 0, 1.0, negative_slope)
        m_col = m_ref[:, :1]
        l_col = l_ref[:, :1]
        # count-weighted probabilities; e - m <= 0 on real slots, the
        # min only guards padding (w == 0 masks it anyway)
        A = jnp.where(
            w > 0,
            w * jnp.exp(jnp.minimum(e - m_col, 0.0))
            / jnp.maximum(l_col, 1e-20),
            0.0)
        # SDDMM: dalpha(r, u) = G_r . z_u via one NT matmul
        gt = g_ref[...].astype(jnp.float32)
        ghi = gt.astype(jnp.bfloat16)
        glo = (gt - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
        zb = u_ref[...].astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        dalpha = (jax.lax.dot_general(ghi, zb, dn,
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(glo, zb, dn,
                                        preferred_element_type=jnp.float32))
        ds = A * (dalpha - c_ref[:, :1]) * gprime
        acc_ref[:, :1] += jnp.sum(ds, axis=1, keepdims=True)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        ddst_ref[...] = acc_ref[...]


def _gat_dedup_bwd_b2_kernel(job_offsets_ref,
                             src_ref,    # (1, 1, 128) src scores (tile)
                             w_ref,      # (1, TN, CU) int8 transpose block
                             bsc_ref,    # (1, 1, CU) dst scores of uniques
                             msc_ref,    # (1, 1, CU) fwd m of uniques
                             lsc_ref,    # (1, 1, CU) fwd l of uniques
                             csc_ref,    # (1, 1, CU) out.G of uniques
                             gu_ref,     # (CU, D) G rows of uniques
                             z_ref,      # (TN, D) z rows (tile, t-order)
                             dz_ref,     # OUT (TN, D)
                             dsrc_ref,   # OUT (TN, 128)
                             acol_ref,   # scratch (TN, 128)
                             accz_ref,   # scratch (TN, D)
                             accs_ref,   # scratch (TN, 128)
                             *, TN: int, CU: int, negative_slope: float):
    i = pl.program_id(0)
    c = pl.program_id(1)
    njobs = job_offsets_ref[i + 1] - job_offsets_ref[i]

    @pl.when(c == 0)
    def _():
        acol_ref[...] = _dst_col(src_ref, TN)
        accz_ref[...] = jnp.zeros_like(accz_ref)
        accs_ref[...] = jnp.zeros_like(accs_ref)

    @pl.when(c < njobs)
    def _():
        w = w_ref[0].astype(jnp.float32)
        raw = acol_ref[:, :1] + bsc_ref[0, 0][None, :]
        e = jnp.where(raw > 0, raw, negative_slope * raw)
        gprime = jnp.where(raw > 0, 1.0, negative_slope)
        m_r = msc_ref[0, 0][None, :]
        l_r = lsc_ref[0, 0][None, :]
        A = jnp.where(
            w > 0,
            w * jnp.exp(jnp.minimum(e - m_r, 0.0))
            / jnp.maximum(l_r, 1e-20),
            0.0)
        gm = gu_ref[...].astype(jnp.float32)
        hi = gm.astype(jnp.bfloat16)
        lo = (gm - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        Ab = A.astype(jnp.bfloat16)
        accz_ref[...] += (
            jax.lax.dot(Ab, hi, preferred_element_type=jnp.float32)
            + jax.lax.dot(Ab, lo, preferred_element_type=jnp.float32))
        # SDDMM: dalpha(s, r) = z_s . G_r
        zt = z_ref[...].astype(jnp.float32)
        zhi = zt.astype(jnp.bfloat16)
        zlo = (zt - zhi.astype(jnp.float32)).astype(jnp.bfloat16)
        gb = gm.astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        dalpha = (jax.lax.dot_general(zhi, gb, dn,
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(zlo, gb, dn,
                                        preferred_element_type=jnp.float32))
        ds = A * (dalpha - csc_ref[0, 0][None, :]) * gprime
        accs_ref[:, :1] += jnp.sum(ds, axis=1, keepdims=True)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        dz_ref[...] = accz_ref[...].astype(dz_ref.dtype)
        dsrc_ref[...] = accs_ref[...]


def _dst_col(vec_ref, TN: int, h: int = 0):
    """(1, 1, H*128) lane vector, head slice h -> (TN, 128) column
    broadcast: a masked lane reduce (dcol[r] = vec[h*128 + r]) —
    fp32-exact, pure VPU, and the same where+sum idiom the v1 kernels
    use (a degenerate (TN,128)x(1,128) NT matmul trips a Mosaic
    vector.broadcast type bug on this chip)."""
    dv = vec_ref[0, :, h * 128:(h + 1) * 128].astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TN, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TN, 128), 1)
    col = jnp.sum(jnp.where(rows == cols, dv, 0.0), axis=1,
                  keepdims=True)                            # (TN, 1)
    return jnp.broadcast_to(col, (TN, 128))


def _dedup_gathers(t, vecs, z_like):
    """Per-unique-slot gathers for a dedup layout: each (N,) vector in
    ``vecs`` -> (n_jobs, 1, CU); ``z_like`` (N, D) -> (jobs*CU, D).
    Handles the layout's optional pre-permutation."""
    CU = t.cu
    n_jobs = t.u_senders.shape[0] // CU
    if t.perm is not None:
        vecs = [jnp.take(v, t.perm, axis=0) for v in vecs]
        z_like = jnp.take(z_like, t.perm, axis=0)
    lanes = [jnp.take(v, t.u_senders, axis=0)
             .reshape(n_jobs, 1, CU).astype(jnp.float32) for v in vecs]
    rows = jnp.take(z_like, t.u_senders, axis=0)
    return lanes, rows


def _rows_order(t, vec, pad_rows, as_tiles=False):
    """(N,) or (N, D) node-order values -> kernel row order (pos
    scatter), optionally reshaped to (num_tiles, 1, 128) lane tiles."""
    TN = t.tile_rows
    if vec.ndim == 1:
        out = jnp.zeros(pad_rows, jnp.float32)
        if t.pos is not None:
            out = out.at[t.pos].set(vec.astype(jnp.float32))
        else:
            out = out.at[:vec.shape[0]].set(vec.astype(jnp.float32))
        if as_tiles:
            num_tiles = pad_rows // TN
            out = out.reshape(num_tiles, TN)
            if TN < 128:
                out = jnp.pad(out, ((0, 0), (0, 128 - TN)))
            return out.reshape(num_tiles, 1, 128)
        return out
    out = jnp.zeros((pad_rows, vec.shape[1]), vec.dtype)
    if t.pos is not None:
        return out.at[t.pos].set(vec)
    return out.at[:vec.shape[0]].set(vec)


@functools.partial(jax.jit, static_argnames=("negative_slope",))
def _gat_dedup_backward_fused(graph, z, src_score, dst_score, out, m, l,
                              g, negative_slope):
    tf = graph.dedup
    tt = graph.dedup_t
    n = graph.n_nodes
    d = z.shape[1]

    # per-node scalars (node order); m/l arrive per forward OUTPUT row
    c_rows = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                     axis=1)
    if tf.pos is not None:
        m_node = jnp.take(m, tf.pos, axis=0)
        l_node = jnp.take(l, tf.pos, axis=0)
    else:
        m_node, l_node = m[:n], l[:n]

    # ---- B1 on forward tiles: ddst ------------------------------------
    TNf, CUf = tf.tile_rows, tf.cu
    num_tiles_f = tf.num_tiles
    pad_f = num_tiles_f * TNf
    (usc,), uz = _dedup_gathers(tf, [src_score], z)
    dst_tiles = _rows_order(tf, dst_score, pad_f, as_tiles=True)
    g_rows_f = _rows_order(tf, g.astype(jnp.float32), pad_f)
    m128 = jnp.broadcast_to(_rows_order(tf, m_node, pad_f)[:, None],
                            (pad_f, 128))
    l128 = jnp.broadcast_to(_rows_order(tf, l_node, pad_f)[:, None],
                            (pad_f, 128))
    c128 = jnp.broadcast_to(_rows_order(tf, c_rows, pad_f)[:, None],
                            (pad_f, 128))
    n_jobs_f = tf.w_blocks.shape[0]

    def job_f(i, c, offs):
        first = offs[i]
        last = jnp.maximum(offs[i + 1] - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_jobs_f - 1)

    grid_b1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles_f, tf.max_jobs),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, c, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TNf, CUf),
                         lambda i, c, offs: (job_f(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CUf),
                         lambda i, c, offs: (job_f(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CUf, d),
                         lambda i, c, offs: (job_f(i, c, offs), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TNf, d), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TNf, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TNf, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TNf, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TNf, 128), lambda i, c, offs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TNf, 128), jnp.float32),
                        pltpu.VMEM((TNf, 128), jnp.float32)],
    )
    ddst128 = pl.pallas_call(
        functools.partial(_gat_dedup_bwd_b1_kernel, TN=TNf, CU=CUf,
                          negative_slope=negative_slope),
        grid_spec=grid_b1,
        out_shape=jax.ShapeDtypeStruct((pad_f, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tf.job_offsets, dst_tiles, tf.w_blocks, usc, uz, g_rows_f,
      m128, l128, c128)
    ddst = (jnp.take(ddst128[:, 0], tf.pos, axis=0) if tf.pos is not None
            else ddst128[:n, 0])

    # ---- B2 on transpose tiles: dz + dsrc ------------------------------
    TNt, CUt = tt.tile_rows, tt.cu
    num_tiles_t = tt.num_tiles
    pad_t = num_tiles_t * TNt
    (bsc, msc, lsc, csc), gu = _dedup_gathers(
        tt, [dst_score, m_node, l_node, c_rows], g.astype(jnp.float32))
    src_tiles = _rows_order(tt, src_score, pad_t, as_tiles=True)
    z_rows_t = _rows_order(tt, z.astype(jnp.float32), pad_t)
    n_jobs_t = tt.w_blocks.shape[0]

    def job_t(i, c, offs):
        first = offs[i]
        last = jnp.maximum(offs[i + 1] - 1, first)
        return jnp.minimum(jnp.minimum(first + c, last), n_jobs_t - 1)

    grid_b2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles_t, tt.max_jobs),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, c, offs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TNt, CUt),
                         lambda i, c, offs: (job_t(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CUt),
                         lambda i, c, offs: (job_t(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CUt),
                         lambda i, c, offs: (job_t(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CUt),
                         lambda i, c, offs: (job_t(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CUt),
                         lambda i, c, offs: (job_t(i, c, offs), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CUt, d),
                         lambda i, c, offs: (job_t(i, c, offs), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TNt, d), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TNt, d), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TNt, 128), lambda i, c, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((TNt, 128), jnp.float32),
                        pltpu.VMEM((TNt, d), jnp.float32),
                        pltpu.VMEM((TNt, 128), jnp.float32)],
    )
    dz_rows, dsrc128 = pl.pallas_call(
        functools.partial(_gat_dedup_bwd_b2_kernel, TN=TNt, CU=CUt,
                          negative_slope=negative_slope),
        grid_spec=grid_b2,
        out_shape=(
            jax.ShapeDtypeStruct((pad_t, d), z.dtype),
            jax.ShapeDtypeStruct((pad_t, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(tt.job_offsets, src_tiles, tt.w_blocks, bsc, msc, lsc, csc,
      gu, z_rows_t)
    if tt.pos is not None:
        dz = jnp.take(dz_rows, tt.pos, axis=0)
        dsrc = jnp.take(dsrc128[:, 0], tt.pos, axis=0)
    else:
        dz = dz_rows[:n]
        dsrc = dsrc128[:n, 0]
    return None, dz, dsrc.astype(src_score.dtype), \
        ddst.astype(dst_score.dtype)
