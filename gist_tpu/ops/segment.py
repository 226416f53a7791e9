"""Edge-space ops for attention models: SDDMM scores and segment softmax.

The reference computes GAT attention with DGL Python UDFs executed by
the degree-bucketing mailbox machinery (gcn/gat.py:39-65): per edge
``e = leaky_relu(a . [z_src || z_dst])``, then a per-destination softmax
and a weighted neighbor sum.  Degree bucketing is shape-dynamic and
hostile to XLA, so here the same math is expressed as three static-shape
edge-array ops (SDDMM + segment-softmax + weighted SpMM), each a simple
composition of gathers, elementwise work, and segment reductions that
XLA fuses on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gist_tpu.graph import Graph


def sddmm_concat(graph: Graph, z: jnp.ndarray, attn_l: jnp.ndarray,
                 attn_r: jnp.ndarray) -> jnp.ndarray:
    """Edge scores ``e_{s->r} = (z_s . attn_l) + (z_r . attn_r)``.

    Equivalent to the reference's ``attn_fc([z_src || z_dst])``
    (gcn/gat.py:40-43) with the 2*D weight split into its source half
    ``attn_l`` and destination half ``attn_r`` — but computed as two
    dense (N,D)x(D,) products *before* the edge gather, so the MXU work
    is O(N*D) instead of O(E*D).

    Args:
      z: (N, D) projected features.
      attn_l/attn_r: (D,) or (D, H) attention vectors.
    Returns:
      (E,) or (E, H) raw scores (pre leaky-relu).
    """
    src_score = z @ attn_l          # (N,) or (N, H)
    dst_score = z @ attn_r
    # mode="clip": padding receivers (== n_nodes) would otherwise fill
    # NaN (jnp.take's out-of-bounds default) and poison gradients.
    return jnp.take(src_score, graph.senders, axis=0, mode="clip") + \
        jnp.take(dst_score, graph.receivers, axis=0, mode="clip")


def segment_softmax(graph: Graph, scores: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable softmax over each receiver's incoming edges —
    the TPU replacement for ``F.softmax(nodes.mailbox['e'], dim=1)``
    (gcn/gat.py:52).  Padding edges (receiver == n_nodes) get weight 0.
    """
    seg = graph.receivers
    n = graph.n_nodes
    maxes = jax.ops.segment_max(scores, seg, num_segments=n,
                                indices_are_sorted=True)
    # Segments with no edges produce -inf maxes; they are never gathered
    # by a real edge so only guard the padding gather below.
    safe_maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    gathered_max = jnp.take(safe_maxes, jnp.minimum(seg, n - 1), axis=0)
    exp = jnp.exp(scores - gathered_max)
    # Zero out padding edges before the sum so they don't pollute node n-1.
    valid = (seg < n)
    if scores.ndim > 1:
        valid = valid.reshape((-1,) + (1,) * (scores.ndim - 1))
    exp = jnp.where(valid, exp, 0.0)
    sums = jax.ops.segment_sum(exp, seg, num_segments=n,
                               indices_are_sorted=True)
    gathered_sum = jnp.take(sums, jnp.minimum(seg, n - 1), axis=0)
    # eps must be a NORMAL fp32 (1e-38 is subnormal; XLA CPU flushes it
    # to zero, turning empty segments into 0/0 = NaN)
    return exp / jnp.maximum(gathered_sum, 1e-20)


def segment_weighted_sum(graph: Graph, z: jnp.ndarray,
                         alpha: jnp.ndarray) -> jnp.ndarray:
    """Weighted neighbor sum ``h_r = sum_e alpha_e * z_{send(e)}`` —
    the reference's ``sum(alpha * mailbox['z'])`` (gcn/gat.py:54).

    Args:
      z: (N, D) or (N, H, D) values.
      alpha: (E,) or (E, H) edge weights (already zero on padding).
    """
    msgs = jnp.take(z, graph.senders, axis=0)
    if msgs.ndim == 3 and alpha.ndim == 2:      # multi-head
        w = alpha[:, :, None]
    else:
        w = alpha.reshape(alpha.shape + (1,) * (msgs.ndim - alpha.ndim))
    return jax.ops.segment_sum(msgs * w, graph.receivers,
                               num_segments=graph.n_nodes,
                               indices_are_sorted=True)
