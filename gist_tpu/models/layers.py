"""Layer primitives: GraphConv, SAGE layer, GAT layer — pure functions.

Parameter layout convention: all dense weights are ``(in, out)`` so the
forward is ``x @ w`` (MXU-natural).  The reference's torch Linear layout
is the transpose; DGL GraphConv already uses ``(in, out)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gist_tpu.graph import Graph
from gist_tpu.ops.spmm import aggregate


def whole_tensor_layer_norm(h: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """``F.layer_norm(h, h.shape)`` — the reference GCN normalizes over
    the *entire* activation tensor, all nodes jointly (gcn/gcn.py:66),
    not per row.  Replicated exactly for parity."""
    mean = jnp.mean(h)
    var = jnp.mean(jnp.square(h - mean))
    return (h - mean) * jax.lax.rsqrt(var + eps)


def layer_norm(h: jnp.ndarray, scale=None, bias=None, eps: float = 1e-5) -> jnp.ndarray:
    """Per-row LayerNorm over the feature dim.  With ``scale``/``bias``
    it matches ``nn.LayerNorm(d, elementwise_affine=True)``
    (cluster_gcn/modules.py:120); without, the affine-free variant used
    by ISTSAGELayer (modules.py:209)."""
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    out = (h - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


def dropout(h: jnp.ndarray, rate: float, key: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout; identity when key is None (eval) or rate == 0."""
    if key is None or rate <= 0.0:
        return h
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, h.shape)
    return jnp.where(mask, h / keep, 0.0)


# ---------------------------------------------------------------------------
# GraphConv (DGL GraphConv semantics, norm='both')
# ---------------------------------------------------------------------------

def graph_conv(
    graph: Graph,
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    activation=None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """DGL-GraphConv-equivalent layer: ``act(D_in^{-1/2} A D_out^{-1/2} X W + b)``.

    Matches dgl.nn.GraphConv(norm='both') as instantiated by the
    reference (gcn/gcn.py:30-56): source features are scaled by
    out-degree^{-1/2}, aggregated, scaled by in-degree^{-1/2}, with the
    dense projection ordered to minimize FLOPs (project first when
    in_feats > out_feats).
    """
    in_feats, out_feats = w.shape
    src_norm = jnp.where(graph.out_degrees > 0,
                         jax.lax.rsqrt(jnp.maximum(graph.out_degrees, 1.0)),
                         0.0)[:, None]
    dst_norm = jnp.where(graph.in_degrees > 0,
                         jax.lax.rsqrt(jnp.maximum(graph.in_degrees, 1.0)),
                         0.0)[:, None]
    if in_feats > out_feats:
        h = (x @ w) * src_norm
        h = aggregate(graph, h, backend=backend) * dst_norm
    else:
        h = aggregate(graph, x * src_norm, backend=backend) * dst_norm
        h = h @ w
    if b is not None:
        h = h + b
    if activation is not None:
        h = activation(h)
    return h


# ---------------------------------------------------------------------------
# GraphSAGE layer (mean-agg + concat), both flavors
# ---------------------------------------------------------------------------

def sage_layer(
    graph: Graph,
    x: jnp.ndarray,
    params: dict,
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    use_layer_norm: bool = True,
    affine_ln: bool = False,
    activation=None,
    aggregate_first: bool = True,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """GraphSAGE-style layer (cluster_gcn/modules.py:218-237):
    ``ah = (A x) * (1/in_deg); h = act(LN([x || ah] @ w + b))``.

    * ``affine_ln=False`` + dropout after the concat = ISTSAGELayer
      (modules.py:191-243; note its dropout sits between concat and
      linear, modules.py:229-233).
    * ``aggregate_first=False`` skips aggregation entirely (the
      ``use_pp`` precomputed-first-layer path, modules.py:133) — the
      input is then already ``[x || ah]`` of width 2*in.
    """
    if aggregate_first:
        inv_deg = jnp.where(graph.in_degrees > 0,
                            1.0 / jnp.maximum(graph.in_degrees, 1.0),
                            0.0)[:, None]
        ah = aggregate(graph, x, backend=backend) * inv_deg
        h = jnp.concatenate([x, ah], axis=1)
    else:
        h = x
    h = dropout(h, dropout_rate, dropout_key)
    h = h @ params["w"] + params["b"]
    if use_layer_norm:
        if affine_ln:
            h = layer_norm(h, params["ln_scale"], params["ln_bias"])
        else:
            h = layer_norm(h)
    if activation is not None:
        h = activation(h)
    return h


# ---------------------------------------------------------------------------
# GAT layer (single head)
# ---------------------------------------------------------------------------

def gat_layer(
    graph: Graph,
    x: jnp.ndarray,
    params: dict,
    *,
    negative_slope: float = 0.01,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Single-head GAT layer (gcn/gat.py:24-65):
    ``z = x @ w;  e = leaky_relu(a . [z_s || z_r]);  alpha = softmax_r(e);
    h_r = sum alpha * z_s`` — expressed as SDDMM + segment-softmax +
    weighted SpMM instead of DGL's degree-bucketed mailbox UDFs.

    ``params`` holds ``w`` (in, out) and ``attn`` (2*out,), the flattened
    attn_fc weight; its first half dots z_src, second half z_dst
    (gcn/gat.py:41-42 concat order).
    """
    from gist_tpu.ops.segment import (sddmm_concat, segment_softmax,
                                      segment_weighted_sum)

    w = params["w"]
    attn = params["attn"]
    out_dim = w.shape[1]
    z = x @ w
    scores = sddmm_concat(graph, z, attn[:out_dim], attn[out_dim:])
    scores = jax.nn.leaky_relu(scores, negative_slope)
    alpha = segment_softmax(graph, scores)
    return segment_weighted_sum(graph, z, alpha)
