"""Vanilla GCN: a stack of GraphConv layers with whole-tensor LayerNorm.

Functional re-design of the reference GCN (gcn/gcn.py:6-67): dropout
before every layer except the first, ReLU inside every layer except the
last, ``F.layer_norm(h, h.shape)`` (whole-tensor!) after every layer
except the last.  Supports the IST ``split_input``/``split_output``/
``num_subnet`` width arithmetic for sub-model construction.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp

from gist_tpu.graph import Graph
from gist_tpu.models.common import glorot_uniform, ist_layer_dims
from gist_tpu.models.layers import dropout, graph_conv, whole_tensor_layer_norm


@dataclass(frozen=True)
class GCNConfig:
    in_feats: int
    n_hidden: int
    n_classes: int
    n_layers: int = 1          # number of hidden layers (stack = n_layers+1)
    dropout: float = 0.5
    use_layernorm: bool = True
    split_input: bool = False
    split_output: bool = False
    num_subnet: int = 1
    dtype: str = "float32"     # compute dtype; logits return fp32

    def layer_dims(self):
        return ist_layer_dims(
            self.in_feats, self.n_hidden, self.n_classes, self.n_layers,
            split_input=self.split_input, split_output=self.split_output,
            num_subnet=self.num_subnet)

    def sub_config(self, *, split_input: bool, split_output: bool,
                   num_subnet: int) -> "GCNConfig":
        return replace(self, split_input=split_input,
                       split_output=split_output, num_subnet=num_subnet)


def init(key: jax.Array, cfg: GCNConfig) -> dict:
    """Params: {"layers": [{"w": (in,out), "b": (out,)}, ...]}.
    GraphConv init = xavier_uniform weight, zero bias (DGL default)."""
    layers = []
    for (d_in, d_out) in cfg.layer_dims():
        key, wk = jax.random.split(key)
        layers.append({
            "w": glorot_uniform(wk, (d_in, d_out)),
            "b": jnp.zeros((d_out,), jnp.float32),
        })
    return {"layers": layers}


def apply(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    cfg: GCNConfig,
    *,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Forward pass (gcn/gcn.py:59-67 ordering)."""
    layers = params["layers"]
    n = len(layers)
    h = x
    if cfg.dtype != "float32":
        dt = jnp.dtype(cfg.dtype)
        h = h.astype(dt)
        layers = jax.tree.map(lambda a: a.astype(dt), layers)
    for i, layer in enumerate(layers):
        if i != 0 and train and cfg.dropout > 0:
            dropout_key, dk = jax.random.split(dropout_key)
            h = dropout(h, cfg.dropout, dk)
        is_last = i == n - 1
        h = graph_conv(graph, h, layer["w"], layer["b"],
                       activation=None if is_last else jax.nn.relu,
                       backend=backend)
        if not is_last and cfg.use_layernorm:
            h = whole_tensor_layer_norm(h)
    return h.astype(jnp.float32)
