"""Layer-level building blocks for graph-sharded models.

Everything here runs INSIDE ``shard_map`` over the ``graph`` mesh axis:
``x_loc`` is one device's (n_loc_pad, F) row block, ``dev`` is the local
slice of :func:`gist_tpu.parallel.train.device_arrays` (leading device
axis already stripped).  The primitives compose into the sharded GCN /
SAGE / GAT forwards in ``parallel/train.py`` — the reference has no
analog (every rank holds the whole graph,
cluster_gcn/cluster_gcn_ist_distrib.py:482-517); this is the
framework's graph-scale axis.

Communication pattern shared by all three model families: edges are
partitioned by RECEIVER owner, so every in-edge of a local node is
local once the needed boundary sender rows have arrived via the ring
halo exchange (``_ring_halo``).  That makes even the GAT per-dst
softmax a purely local segment op — cut-edge scores ride the halo with
their sender rows instead of needing a second max/denominator exchange.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gist_tpu.parallel.graph_shard import (ShardedGraph, _dedup_agg_fn,
                                           _local_agg_ring, _ring_halo)

__all__ = [
    "sharded_sum_agg", "sharded_mean_agg", "sharded_halo",
    "sharded_whole_tensor_layer_norm", "sharded_gat_attention",
]


def sharded_sum_agg(sg: ShardedGraph, x_loc, dev, halo_dtype=None):
    """Distributed ``out[r] = sum_{s->r} x[s]`` for one device's rows:
    ring halo exchange overlapped with the interior-edge SpMM (Pallas
    dedup kernel when the bundle carries tiles)."""
    return _local_agg_ring(sg, x_loc, dev, halo_dtype)


def sharded_mean_agg(sg: ShardedGraph, x_loc, dev, halo_dtype=None):
    """Mean aggregation ``(1/deg) * sum`` — the SAGE/ISTSAGELayer norm
    (cluster_gcn/modules.py:155-159, 224-225)."""
    inv = jnp.where(dev["in_deg"] > 0,
                    1.0 / jnp.maximum(dev["in_deg"], 1.0), 0.0)[:, None]
    return sharded_sum_agg(sg, x_loc, dev, halo_dtype) * inv


def sharded_halo(sg: ShardedGraph, x_loc, dev, halo_dtype=None):
    """Just the boundary-row exchange: returns the halo stack in ring
    order (what ``dev['bnd_s']`` indexes).  Models that need more than
    plain sums (GAT ships [z || src-score] rows) call this directly."""
    return _ring_halo(sg, x_loc, dev["ring_send"], halo_dtype)


def sharded_whole_tensor_layer_norm(h, row_valid, *, axis: str = "graph",
                                    eps: float = 1e-5):
    """``F.layer_norm(h, h.shape)`` over the WHOLE sharded tensor — the
    reference GCN normalizes all nodes jointly (gcn/gcn.py:66), so the
    sharded version needs global (psum) moments.  Padded rows are
    excluded from the statistics via ``row_valid`` but still normalized
    (their values are masked everywhere downstream)."""
    v = row_valid[:, None]
    cnt = jax.lax.psum(jnp.sum(v), axis) * h.shape[-1]
    mean = jax.lax.psum(jnp.sum(h * v), axis) / cnt
    var = jax.lax.psum(jnp.sum(jnp.square(h - mean) * v), axis) / cnt
    return (h - mean) * jax.lax.rsqrt(var + eps)


def sharded_gat_attention(sg: ShardedGraph, z_loc, src_s, dst_s, dev,
                          *, negative_slope: float = 0.01,
                          halo_dtype=None):
    """Multi-head GAT attention over the sharded graph: per-dst-node
    softmax of ``leaky_relu(src_s[s] + dst_s[r])`` and the weighted
    neighbor sum, for one device's receiver rows.

    Because edges live with their receiver's owner, the softmax over
    each local node's in-edges only needs the boundary senders' ``z``
    rows and their precomputed source scores — both ride ONE ring halo
    exchange as a concatenated payload (z flattened || src scores).
    The segment max/sum then run locally over the interior + boundary
    edge lists; no distributed softmax machinery.

    Args:
      z_loc:  (n_loc_pad, H, O) projected features.
      src_s:  (n_loc_pad, H) per-node source scores (z . attn_l).
      dst_s:  (n_loc_pad, H) per-node destination scores (z . attn_r).
    Returns:
      (n_loc_pad, H, O) attention-weighted sums (padding rows zero).
    """
    n_pad, heads, d_out = z_loc.shape
    payload = jnp.concatenate(
        [z_loc.reshape(n_pad, heads * d_out), src_s], axis=1)
    halo = sharded_halo(sg, payload, dev, halo_dtype)
    z_h = halo[:, :heads * d_out].reshape(-1, heads, d_out)
    src_h = halo[:, heads * d_out:]
    aux = {k: dev[k] for k in ("int_s", "int_r", "bnd_s", "bnd_r")}
    if "int_dedup" in dev:
        # round 4: interior edges through the dedup attention kernel's
        # partial softmax, merged with the boundary segment partials by
        # (m, l, acc); backward = exact recompute of the local segment
        # math (halo cotangents flow through the vjp's z_h/src_h slots)
        aux["int_dedup"] = dev["int_dedup"]
        att = _gat_local_hybrid_fn(n_pad, negative_slope)
        return att(aux, z_loc, src_s, dst_s, z_h, src_h)
    return _gat_local_segments(aux, z_loc, src_s, dst_s, z_h, src_h,
                               n_pad, negative_slope)


def _gat_local_segments(aux, z_loc, src_s, dst_s, z_h, src_h,
                        n_pad, negative_slope):
    """Post-halo attention via XLA segment ops over the interior +
    boundary edge lists (the reference math, and the exact-vjp body
    the hybrid path's backward recomputes)."""
    int_s, int_r = aux["int_s"], aux["int_r"]
    bnd_s, bnd_r = aux["bnd_s"], aux["bnd_r"]
    # mode="clip" everywhere: padding receivers == n_loc_pad would
    # otherwise fill NaN and poison gradients (models/gat.py:106-110)
    e_int = jax.nn.leaky_relu(
        jnp.take(src_s, int_s, axis=0, mode="clip")
        + jnp.take(dst_s, int_r, axis=0, mode="clip"), negative_slope)
    e_bnd = jax.nn.leaky_relu(
        jnp.take(src_h, bnd_s, axis=0, mode="clip")
        + jnp.take(dst_s, bnd_r, axis=0, mode="clip"), negative_slope)

    m = jnp.maximum(
        jax.ops.segment_max(e_int, int_r, num_segments=n_pad,
                            indices_are_sorted=True),
        jax.ops.segment_max(e_bnd, bnd_r, num_segments=n_pad,
                            indices_are_sorted=True))
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)   # empty segments

    def _exp(e, r):
        g = jnp.take(safe_m, jnp.minimum(r, n_pad - 1), axis=0)
        valid = (r < n_pad)[:, None]
        return jnp.where(valid, jnp.exp(e - g), 0.0)

    x_int, x_bnd = _exp(e_int, int_r), _exp(e_bnd, bnd_r)
    den = (jax.ops.segment_sum(x_int, int_r, num_segments=n_pad,
                               indices_are_sorted=True)
           + jax.ops.segment_sum(x_bnd, bnd_r, num_segments=n_pad,
                                 indices_are_sorted=True))
    # eps must be a NORMAL fp32 (subnormals flush to 0 on XLA CPU)
    den = jnp.maximum(den, 1e-20)

    def _wsum(x_e, r, z_src, s):
        alpha = x_e / jnp.take(den, jnp.minimum(r, n_pad - 1), axis=0)
        msgs = jnp.take(z_src, s, axis=0, mode="clip") * alpha[:, :, None]
        return jax.ops.segment_sum(msgs, r, num_segments=n_pad,
                                   indices_are_sorted=True)

    return _wsum(x_int, int_r, z_loc, int_s) + _wsum(x_bnd, bnd_r, z_h,
                                                     bnd_s)


def _gat_local_hybrid(aux, z_loc, src_s, dst_s, z_h, src_h,
                      n_pad, negative_slope):
    """Interior edges through the dedup attention kernel (partial
    softmax: normalized out + per-row running max m_i / denominator
    l_i), boundary edges through segment partials, merged exactly:

        m = max(m_i, m_b);  l = l_i e^{m_i-m} + l_b e^{m_b-m}
        out = (out_i l_i e^{m_i-m} + acc_b e^{m_b-m}) / l

    The -1e30 empty sentinel keeps every term finite (e^{0} paths)."""
    from gist_tpu.ops.pallas_gat import NEG_INF, _mh_tiles_forward

    out_i, m_i, l_i = _mh_tiles_forward(
        aux["int_dedup"], n_pad, z_loc, src_s, dst_s, negative_slope)
    acc_i = out_i * l_i[..., None]                          # (n, H, O)

    bnd_s, bnd_r = aux["bnd_s"], aux["bnd_r"]
    e_bnd = jax.nn.leaky_relu(
        jnp.take(src_h, bnd_s, axis=0, mode="clip")
        + jnp.take(dst_s, bnd_r, axis=0, mode="clip"), negative_slope)
    m_b = jax.ops.segment_max(e_bnd, bnd_r, num_segments=n_pad,
                              indices_are_sorted=True)
    m_b = jnp.where(jnp.isfinite(m_b), m_b, NEG_INF)
    g = jnp.take(m_b, jnp.minimum(bnd_r, n_pad - 1), axis=0)
    valid = (bnd_r < n_pad)[:, None]
    x_b = jnp.where(valid, jnp.exp(jnp.minimum(e_bnd - g, 0.0)), 0.0)
    l_b = jax.ops.segment_sum(x_b, bnd_r, num_segments=n_pad,
                              indices_are_sorted=True)
    acc_b = jax.ops.segment_sum(
        jnp.take(z_h, bnd_s, axis=0, mode="clip") * x_b[:, :, None],
        bnd_r, num_segments=n_pad, indices_are_sorted=True)

    m = jnp.maximum(m_i, m_b)
    si = jnp.exp(m_i - m)
    sb = jnp.exp(m_b - m)
    l = l_i * si + l_b * sb
    out = (acc_i * si[..., None] + acc_b * sb[..., None]) \
        / jnp.maximum(l, 1e-20)[..., None]
    return jnp.where(l[..., None] > 0, out, 0.0)


def _gat_local_hybrid_fn(n_pad: int, negative_slope: float):
    """custom_vjp wrapper: kernel-accelerated forward, exact
    segment-recompute backward (same shape as graph_shard._dedup_agg_fn
    — aux arrays get a None cotangent)."""

    @jax.custom_vjp
    def att(aux, z_loc, src_s, dst_s, z_h, src_h):
        return _gat_local_hybrid(aux, z_loc, src_s, dst_s, z_h, src_h,
                                 n_pad, negative_slope)

    def fwd(aux, z_loc, src_s, dst_s, z_h, src_h):
        return att(aux, z_loc, src_s, dst_s, z_h, src_h), \
            (aux, z_loc, src_s, dst_s, z_h, src_h)

    def bwd(res, g):
        aux, z_loc, src_s, dst_s, z_h, src_h = res
        _, vjp = jax.vjp(
            lambda z, a, b, zh, sh: _gat_local_segments(
                aux, z, a, b, zh, sh, n_pad, negative_slope),
            z_loc, src_s, dst_s, z_h, src_h)
        return (None,) + vjp(g)

    att.defvjp(fwd, bwd)
    return att
