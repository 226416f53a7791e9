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
