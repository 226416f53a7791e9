"""Multi-head GAT (gcn/gat.py:24-98) with IST-capable width arithmetic.

Heads are a leading axis of stacked parameters rather than separate
modules — one batched matmul across heads instead of a Python loop
(gat.py:74-75), which keeps the MXU fed and makes per-head IST slicing a
plain indexed slice.

The reference's ``MultiHeadGATLayer.forward`` reduces head outputs with
``torch.mean(torch.stack(head_outs))`` — a scalar! (SURVEY §2.4).  The
intended semantics, mean over the head axis, is implemented here.  The
comment at gat.py:87-89 mentions concatenation, but the code never
concatenates; we follow mean-over-heads so hidden widths match the
reference's layer shapes (hidden_dim, not hidden_dim*num_heads).

The fused attention kernel path (``backend="pallas"``) consumes either
the block-dense dedup layout (``graph.dedup``, preferred — round 4: GAT
scores are rank-1 in the node scores, so the kernel rebuilds each score
block from per-node vectors and runs the message matmul over UNIQUE
sender rows, ~0.35x the per-edge traffic, with a fused two-kernel
scatter-free backward) or the v1 edge-order tile layout
(``graph.tiled``).  Callers don't need to know: ``apply`` resolves
``backend=None`` through the global spmm setting (pallas iff the graph
carries either layout on real TPU), and the GAT trainers/sampler build
a layout automatically (ClusterSampler tile_mode "dedup"/"gather").
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gist_tpu.graph import Graph
from gist_tpu.models.common import xavier_normal_gain
from gist_tpu.ops.segment import segment_softmax, segment_weighted_sum


@dataclass(frozen=True)
class GATConfig:
    in_feats: int
    n_hidden: int
    n_classes: int
    n_layers: int = 2          # TOTAL layers, matching GAT(num_layers=..) (gat.py:79)
    n_heads: int = 2
    num_subnet: int = 1        # hidden dims divided for IST sub-models
    # compute dtype inside apply ("float32" or "bfloat16"); logits are
    # returned fp32.  bf16 halves HBM traffic for the edge-score +
    # message streams (the SAGE stack has the same knob).
    dtype: str = "float32"

    def layer_shapes(self):
        """[(in, out, heads)] per layer: first in->hidden (H heads),
        middles hidden->hidden (H heads), last hidden->classes (1 head)
        (gat.py:80-91)."""
        hid = -(-self.n_hidden // self.num_subnet)  # ceil: see
        # models/common.ist_layer_dims on non-divisible widths
        shapes = [(self.in_feats, hid, self.n_heads)]
        for _ in range(self.n_layers - 2):
            shapes.append((hid, hid, self.n_heads))
        shapes.append((hid, self.n_classes, 1))
        return shapes

    def sub_config(self, num_subnet: int) -> "GATConfig":
        return replace(self, num_subnet=num_subnet)


def init(key: jax.Array, cfg: GATConfig) -> dict:
    """Params per layer: ``w`` (heads, in, out), ``attn`` (heads, 2*out).
    xavier_normal with gain sqrt(2) (gat.py:33-37)."""
    gain = float(np.sqrt(2.0))
    layers = []
    for (d_in, d_out, heads) in cfg.layer_shapes():
        key, wk, ak = jax.random.split(key, 3)
        w = jnp.stack([
            xavier_normal_gain(k, (d_in, d_out), gain)
            for k in jax.random.split(wk, heads)
        ])
        attn = jnp.stack([
            xavier_normal_gain(k, (2 * d_out,), gain)
            for k in jax.random.split(ak, heads)
        ])
        layers.append({"w": w, "attn": attn})
    return {"layers": layers}


def _multi_head_layer(graph: Graph, h: jnp.ndarray, layer: dict,
                      negative_slope: float,
                      backend: str = "segment") -> jnp.ndarray:
    """All heads at once: z (N, heads, out) via one einsum; SDDMM /
    softmax / weighted-sum batched over the head axis; mean over heads."""
    w, attn = layer["w"], layer["attn"]
    heads, d_in, d_out = w.shape
    z = jnp.einsum("nf,hfo->nho", h, w)              # (N, H, O)
    if backend == "pallas" and (graph.tiled is not None
                                or graph.dedup is not None
                                or graph.dedup_c is not None):
        from gist_tpu.ops.pallas_gat import (gat_attention_dedup,
                                             gat_attention_dedup_chunked,
                                             gat_attention_dedup_mh,
                                             gat_attention_pallas)
        # dedup layout preferred: messages matmul over unique sender
        # rows (~0.35x the per-edge traffic) and no per-edge score array
        if graph.dedup_c is not None:
            # chunked layout: >HBM-scale graphs (full-Reddit 115M-edge
            # full-graph eval); all heads per kernel call, memory
            # bounded to one chunk's gathered rows
            dp = -(-d_out // 128) * 128
            if heads * dp <= 1024:
                a = jnp.einsum("nho,ho->nh", z, attn[:, :d_out])
                b = jnp.einsum("nho,ho->nh", z, attn[:, d_out:])
                out = gat_attention_dedup_chunked(graph, z, a, b,
                                                  negative_slope)
                return jnp.mean(out, axis=1)
            outs = []
            for hd in range(heads):     # per-head: VMEM-bounded
                zh = z[:, hd:hd + 1, :]
                a = jnp.einsum("nho,ho->nh", zh, attn[hd:hd + 1, :d_out])
                b = jnp.einsum("nho,ho->nh", zh, attn[hd:hd + 1, d_out:])
                outs.append(gat_attention_dedup_chunked(
                    graph, zh, a, b, negative_slope)[:, 0])
            return jnp.mean(jnp.stack(outs), axis=0)
        if graph.dedup is not None:
            dp = -(-d_out // 128) * 128
            if heads * dp <= 1024:
                # all heads in one kernel call: one unique-row gather
                # and one count-block read per job serve every head
                a = jnp.einsum("nho,ho->nh", z, attn[:, :d_out])
                b = jnp.einsum("nho,ho->nh", z, attn[:, d_out:])
                out = gat_attention_dedup_mh(graph, z, a, b,
                                             negative_slope)
                return jnp.mean(out, axis=1)
            kernel = gat_attention_dedup   # per-head: VMEM-bounded
        else:
            kernel = gat_attention_pallas
        outs = []
        for hd in range(heads):
            zh = z[:, hd, :]
            a = zh @ attn[hd, :d_out]
            b = zh @ attn[hd, d_out:]
            outs.append(kernel(graph, zh, a, b, negative_slope))
        return jnp.mean(jnp.stack(outs), axis=0)
    # per-head scores: (E, H)
    src = jnp.einsum("nho,ho->nh", z, attn[:, :d_out])
    dst = jnp.einsum("nho,ho->nh", z, attn[:, d_out:])
    # mode="clip": padding edges carry receiver == n_nodes; the default
    # out-of-bounds fill is NaN, which poisons gradients through the
    # downstream masks even though the forward value is masked out.
    scores = jnp.take(src, graph.senders, axis=0, mode="clip") + jnp.take(
        dst, graph.receivers, axis=0, mode="clip")
    scores = jax.nn.leaky_relu(scores, negative_slope)
    alpha = segment_softmax(graph, scores)            # (E, H)
    out = segment_weighted_sum(graph, z, alpha)       # (N, H, O)
    return jnp.mean(out, axis=1)                      # mean over heads


def apply(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    cfg: GATConfig,
    *,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    negative_slope: float = 0.01,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """GAT forward (gat.py:93-98): ELU after every layer, including the
    last (the reference applies F.elu unconditionally).

    ``backend=None`` resolves via the global spmm backend setting: the
    fused Pallas attention kernel whenever the graph carries the v1
    gather layout on real TPU hardware, XLA segment ops elsewhere."""
    from gist_tpu.ops.spmm import resolve_gat_backend
    backend = resolve_gat_backend(graph, backend)
    layers = params["layers"]
    h = x
    if cfg.dtype != "float32":
        dt = jnp.dtype(cfg.dtype)
        h = h.astype(dt)
        layers = jax.tree.map(lambda a: a.astype(dt), layers)
    for layer in layers:
        h = _multi_head_layer(graph, h, layer, negative_slope,
                              backend=backend)
        h = jax.nn.elu(h)
    return h.astype(jnp.float32)
