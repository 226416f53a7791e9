"""GraphSAGE-style stacks — the workhorse of the cluster-GCN pipeline.

Two stacks mirroring cluster_gcn/modules.py:

* :func:`init`/:func:`apply` — the IST-capable "GCN" model
  (modules.py:245-314): ISTSAGELayer stack (affine-free LayerNorm,
  dropout between concat and linear), LayerNorm+ReLU on all layers
  except the output layer.  This is what both the Cluster-GCN baseline
  (cluster_gcn.py:67-69) and the distributed GIST engine
  (cluster_gcn_ist_distrib.py:81-90) train.
* :func:`init_graphsage`/:func:`apply_graphsage` — the plain GraphSAGE
  model with affine LayerNorm and ``use_pp`` first-layer skip
  (modules.py:100-189).

SAGE layers take the concatenated ``[h || Ah]`` input, so each weight is
``(2*in, out)`` in our (in, out) layout.  The IST slicing rules over the
doubled input dim live in gist_tpu/ist/slicing.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp

from gist_tpu.graph import Graph
from gist_tpu.models.common import ist_layer_dims, torch_linear_uniform
from gist_tpu.models.layers import sage_layer


@dataclass(frozen=True)
class SAGEConfig:
    in_feats: int
    n_hidden: int
    n_classes: int
    n_layers: int = 1          # hidden layers; stack = n_layers + 1
    dropout: float = 0.2
    use_layernorm: bool = True
    split_input: bool = False
    split_output: bool = False
    num_subnet: int = 1
    use_pp: bool = False       # first-layer aggregation precomputed
    # compute dtype for activations/weights inside apply ("float32" or
    # "bfloat16"); logits are always returned fp32.  bf16 halves HBM
    # traffic for the gather-dominated aggregation.
    dtype: str = "float32"

    def layer_dims(self):
        return ist_layer_dims(
            self.in_feats, self.n_hidden, self.n_classes, self.n_layers,
            split_input=self.split_input, split_output=self.split_output,
            num_subnet=self.num_subnet)

    def sub_config(self, *, split_input: bool, split_output: bool,
                   num_subnet: int) -> "SAGEConfig":
        return replace(self, split_input=split_input,
                       split_output=split_output, num_subnet=num_subnet)


def _init_layer(key, d_in: int, d_out: int, affine_ln: bool) -> dict:
    """ISTSAGELayer init: w and b ~ U(-s, s), s = 1/sqrt(2*in)
    (modules.py:213-216; fan_in is the doubled input width)."""
    wk, bk = jax.random.split(key)
    p = {
        "w": torch_linear_uniform(wk, (2 * d_in, d_out), fan_in=2 * d_in),
        "b": torch_linear_uniform(bk, (d_out,), fan_in=2 * d_in),
    }
    if affine_ln:
        p["ln_scale"] = jnp.ones((d_out,), jnp.float32)
        p["ln_bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init(key: jax.Array, cfg: SAGEConfig) -> dict:
    layers = []
    for (d_in, d_out) in cfg.layer_dims():
        key, lk = jax.random.split(key)
        layers.append(_init_layer(lk, d_in, d_out, affine_ln=False))
    return {"layers": layers}


def apply(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    cfg: SAGEConfig,
    *,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """ISTSAGELayer-stack forward (modules.py:310-314): every layer
    aggregates; LayerNorm (affine-free) + ReLU on all but the last."""
    layers = params["layers"]
    n = len(layers)
    h = x
    if cfg.dtype != "float32":
        dt = jnp.dtype(cfg.dtype)
        h = h.astype(dt)
        layers = jax.tree.map(lambda a: a.astype(dt), layers)
    for i, layer in enumerate(layers):
        dk = None
        if train and cfg.dropout > 0:
            dropout_key, dk = jax.random.split(dropout_key)
        is_last = i == n - 1
        skip_agg = (i == 0 and cfg.use_pp and train)
        h = sage_layer(
            graph, h, layer,
            dropout_rate=cfg.dropout if train else 0.0,
            dropout_key=dk,
            use_layer_norm=cfg.use_layernorm and not is_last,
            affine_ln=False,
            activation=None if is_last else jax.nn.relu,
            aggregate_first=not skip_agg,
            backend=backend,
        )
    return h.astype(jnp.float32)


def apply_chunked_host(
    params: dict,
    senders,
    receivers,
    x,
    cfg: SAGEConfig,
    *,
    edge_chunk: int = 500_000,
    node_chunk: int = 131_072,
    store_dtype=None,
) -> "np.ndarray":
    """Memory-bounded full-graph eval forward on the HOST (numpy BLAS).

    The ultra-wide regime evaluates a full-width model on the full
    graph; at h2048 x 2.45M nodes the plain ``apply`` materializes a
    40 GB ``[h || Ah]`` concat (more with XLA temporaries) and exceeds
    both HBM and comfortable host RAM.  This walks the same math
    (aggregate -> concat -> linear -> affine-free LN -> relu,
    modules.py:218-237) with bounded intermediates: edge-chunked
    segment aggregation (receiver-sorted reduceat) and node-chunked
    linears, fp16 intermediate storage / fp32 compute.  Eval only —
    no dropout, no use_pp skip (eval never skips, modules.py:133)."""
    import numpy as np

    store_dtype = store_dtype or np.float16
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    n = x.shape[0]
    # torch backend (CPU): multithreaded sparse-CSR SpMM + GEMM — on the
    # 4-core bench host this is ~3-4x the scipy/numpy path at h2048
    # (the numpy GEMM/LN chain is the eval wall for ultra-wide widths).
    # GIST_EVAL_BACKEND=numpy forces the reference path (tests compare).
    backend = os.environ.get("GIST_EVAL_BACKEND", "auto")
    if backend in ("auto", "torch"):
        try:
            import torch  # noqa: F401
            return _apply_chunked_torch(params, senders, receivers, x,
                                        cfg, node_chunk=node_chunk,
                                        store_dtype=store_dtype)
        except ImportError:
            if backend == "torch":
                raise
    # aggregation backend: scipy CSR (compiled, streams the edge list —
    # the numpy reduceat path moves ~E*F*itemsize of fancy-gather
    # traffic per layer and is several times slower at 125M edges)
    try:
        import scipy.sparse as sp
        A = sp.csr_matrix(
            (np.ones(len(senders), np.float32),
             (receivers.astype(np.int64), senders.astype(np.int64))),
            shape=(n, n))
        ss = rr = None
    except ImportError:
        A = None
        order = np.argsort(receivers, kind="stable")
        ss, rr = senders[order], receivers[order]
    deg = np.bincount(receivers, minlength=n)[:n].astype(np.float32)
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0),
                       0.0).astype(np.float32)[:, None]

    h = np.asarray(x, np.float32).astype(store_dtype)
    layers = params["layers"]
    col_chunk = 512
    for li, layer in enumerate(layers):
        w = np.asarray(layer["w"], np.float32)
        b = np.asarray(layer["b"], np.float32)
        f = h.shape[1]
        ah = np.zeros((n, f), np.float32)
        if A is not None:
            for c in range(0, f, col_chunk):
                d = min(c + col_chunk, f)
                ah[:, c:d] = A @ h[:, c:d].astype(np.float32)
        else:
            for a in range(0, len(ss), edge_chunk):
                e = min(a + edge_chunk, len(ss))
                rows = h[ss[a:e]].astype(np.float32)
                rseg = rr[a:e]
                starts = np.nonzero(np.diff(rseg, prepend=-1))[0]
                ah[rseg[starts]] += np.add.reduceat(rows, starts, axis=0)
        ah *= inv_deg
        is_last = li == len(layers) - 1
        out = np.empty((n, w.shape[1]),
                       np.float32 if is_last else store_dtype)
        for i in range(0, n, node_chunk):
            j = min(i + node_chunk, n)
            hcat = np.concatenate(
                [h[i:j].astype(np.float32), ah[i:j]], axis=1)
            o = hcat @ w + b
            if cfg.use_layernorm and not is_last:
                o -= o.mean(axis=1, keepdims=True)
                o /= np.sqrt(o.var(axis=1, keepdims=True) + 1e-5)
            if not is_last:
                np.maximum(o, 0.0, out=o)
            out[i:j] = o
        del ah
        h = out
    return h


def _apply_chunked_torch(params, senders, receivers, x, cfg, *,
                         node_chunk, store_dtype):
    """torch-CPU variant of the chunked host forward — identical math
    (aggregate -> concat -> linear -> affine-free LN -> relu, fp32
    compute / fp16 storage), with ATen's parallel sparse-CSR SpMM and
    GEMM doing the heavy lifting.  Parity-tested against the numpy
    path in tests/test_ultrawide.py."""
    import numpy as np
    import torch

    n = x.shape[0]
    store_t = torch.float16 if store_dtype == np.float16 else torch.float32
    # receiver-row CSR of A (out[r] = sum_{s->r} h[s]): build via scipy
    # (fast C coo->csr), hand the buffers to torch zero-copy
    import scipy.sparse as sp
    A = sp.csr_matrix(
        (np.ones(len(senders), np.float32), (receivers, senders)),
        shape=(n, n))
    At = torch.sparse_csr_tensor(
        torch.from_numpy(A.indptr.astype(np.int64)),
        torch.from_numpy(A.indices.astype(np.int64)),
        torch.from_numpy(A.data), size=(n, n))
    deg = np.bincount(receivers, minlength=n)[:n].astype(np.float32)
    inv_deg = torch.from_numpy(
        np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0))[:, None]

    h = torch.from_numpy(np.asarray(x, np.float32)).to(store_t)
    layers = params["layers"]
    col_chunk = 512
    with torch.no_grad():
        for li, layer in enumerate(layers):
            w = torch.from_numpy(np.asarray(layer["w"], np.float32))
            b = torch.from_numpy(np.asarray(layer["b"], np.float32))
            f = h.shape[1]
            ah = torch.empty((n, f), dtype=torch.float32)
            for c in range(0, f, col_chunk):
                d = min(c + col_chunk, f)
                ah[:, c:d] = At @ h[:, c:d].float()
            ah *= inv_deg
            is_last = li == len(layers) - 1
            out = torch.empty((n, w.shape[1]),
                              dtype=torch.float32 if is_last else store_t)
            for i in range(0, n, node_chunk):
                j = min(i + node_chunk, n)
                hcat = torch.cat([h[i:j].float(), ah[i:j]], dim=1)
                o = hcat @ w + b
                if cfg.use_layernorm and not is_last:
                    o -= o.mean(dim=1, keepdim=True)
                    o /= torch.sqrt(o.var(dim=1, unbiased=False,
                                          keepdim=True) + 1e-5)
                if not is_last:
                    o.clamp_(min=0.0)
                out[i:j] = o.to(out.dtype)
            del ah
            h = out
    return h.numpy()


# ---------------------------------------------------------------------------
# Plain GraphSAGE (affine LN) — modules.py:100-189
# ---------------------------------------------------------------------------

def init_graphsage(key: jax.Array, cfg: SAGEConfig) -> dict:
    dims = [(cfg.in_feats, cfg.n_hidden)]
    dims += [(cfg.n_hidden, cfg.n_hidden)] * (cfg.n_layers - 1)
    dims += [(cfg.n_hidden, cfg.n_classes)]
    layers = []
    for i, (d_in, d_out) in enumerate(dims):
        key, lk = jax.random.split(key)
        affine = i < len(dims) - 1   # output layer has use_lynorm=False
        layers.append(_init_layer(lk, d_in, d_out, affine_ln=affine))
    return {"layers": layers}


def apply_graphsage(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    cfg: SAGEConfig,
    *,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """GraphSAGE forward (modules.py:185-189).  With ``use_pp`` the first
    layer skips aggregation during training only (modules.py:133)."""
    layers = params["layers"]
    n = len(layers)
    h = x
    for i, layer in enumerate(layers):
        dk = None
        if train and cfg.dropout > 0:
            dropout_key, dk = jax.random.split(dropout_key)
        is_last = i == n - 1
        skip_agg = (i == 0 and cfg.use_pp and train)
        h = sage_layer(
            graph, h, layer,
            dropout_rate=cfg.dropout if train else 0.0,
            dropout_key=dk,
            use_layer_norm=not is_last,
            affine_ln=not is_last,
            activation=None if is_last else jax.nn.relu,
            aggregate_first=not skip_agg,
            backend=backend,
        )
    return h
