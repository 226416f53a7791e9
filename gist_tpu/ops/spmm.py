"""Sparse neighborhood aggregation (SpMM): ``out[i] = sum_{(s,i) in E} x[s]``.

This is the hot op of every model in the framework — the TPU-native
replacement for DGL's native C++/CUDA SpMM behind
``update_all(fn.copy_src, fn.sum)`` (reference:
cluster_gcn/modules.py:136-137, 224-225; SURVEY.md §2.3).

Two backends:

* ``segment`` — pure XLA: gather source rows, ``segment_sum`` over
  receivers.  Differentiable out of the box (the VJP is the transpose
  gather/scatter, which XLA emits itself).  Correctness reference.
* ``pallas`` — CSR dest-tiled Pallas kernel (gist_tpu/ops/pallas_spmm.py)
  that streams edges through VMEM and turns the scatter-accumulate into
  MXU one-hot matmuls.  Used when shapes allow; falls back to ``segment``
  otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gist_tpu.graph import Graph

_DEFAULT_BACKEND = "auto"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    assert name in ("segment", "pallas", "auto"), name
    _DEFAULT_BACKEND = name


def resolve_backend(graph: Optional[Graph] = None,
                    backend: Optional[str] = None) -> str:
    """``auto`` (the default) selects the Pallas kernel whenever the
    graph carries a tile layout and we are on real TPU hardware; CPU
    (tests, dry runs) and tile-less graphs use the XLA segment path."""
    backend = backend or _DEFAULT_BACKEND
    if backend != "auto":
        return backend
    has_tiles = graph is not None and (graph.dedup is not None
                                       or graph.dedup_c is not None
                                       or graph.tiled is not None)
    return "pallas" if has_tiles and jax.default_backend() == "tpu" \
        else "segment"


def resolve_gat_backend(graph: Optional[Graph] = None,
                        backend: Optional[str] = None) -> str:
    """Backend resolution for the GAT attention path: fused kernels
    exist for the flat dedup layout (``graph.dedup``, round 4 — no
    per-edge arrays, unique-row message matmuls) and the v1 gather
    layout (``graph.tiled``); the chunked dedup layout (huge graphs)
    has no attention kernel."""
    backend = backend or _DEFAULT_BACKEND
    if backend != "auto":
        return backend
    has_tiles = graph is not None and (graph.tiled is not None
                                       or graph.dedup is not None)
    return "pallas" if has_tiles and jax.default_backend() == "tpu" \
        else "segment"


def tiles_wanted() -> bool:
    """Should graph builders pay the host-side tile-layout cost?  True
    when the active backend could consume them (pallas, or auto on TPU)."""
    if _DEFAULT_BACKEND == "pallas":
        return True
    return _DEFAULT_BACKEND == "auto" and jax.default_backend() == "tpu"


def spmm_segment(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """XLA gather + segment-sum aggregation.

    Padding edges have ``receivers == n_nodes`` which ``segment_sum``
    drops (out-of-range segment ids contribute nothing), so no masking
    is needed.
    """
    msgs = jnp.take(x, graph.senders, axis=0)
    return jax.ops.segment_sum(
        msgs,
        graph.receivers,
        num_segments=graph.n_nodes,
        indices_are_sorted=True,
    )


def spmm_segment_chunked(graph: Graph, x: jnp.ndarray,
                         edge_chunk: Optional[int] = None) -> jnp.ndarray:
    """Memory-bounded aggregation for huge graphs: both the plain
    segment path and the pallas path materialize the gathered (E, F)
    messages, which for Amazon2M-scale edge counts (>100M) exceeds HBM.
    This version scans edge chunks, accumulating partial segment sums —
    peak extra memory = edge_chunk * F (default sized to ~1 GiB).
    """
    if edge_chunk is None:
        f_bytes = max(int(x.shape[-1]) * x.dtype.itemsize, 1)
        edge_chunk = max(2 ** 30 // f_bytes, 65536)
    e_pad = graph.n_edges_padded
    if e_pad <= edge_chunk:
        return spmm_segment(graph, x)
    n_chunks = -(-e_pad // edge_chunk)
    pad = n_chunks * edge_chunk - e_pad
    senders = jnp.concatenate(
        [graph.senders, jnp.zeros((pad,), graph.senders.dtype)])
    receivers = jnp.concatenate(
        [graph.receivers,
         jnp.full((pad,), graph.n_nodes, graph.receivers.dtype)])
    senders = senders.reshape(n_chunks, edge_chunk)
    receivers = receivers.reshape(n_chunks, edge_chunk)

    def body(acc, chunk):
        s, r = chunk
        acc = acc + jax.ops.segment_sum(
            jnp.take(x, s, axis=0), r, num_segments=graph.n_nodes)
        return acc, None

    init = jnp.zeros((graph.n_nodes, x.shape[1]), x.dtype)
    out, _ = jax.lax.scan(body, init, (senders, receivers))
    return out


def spmm_pallas(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    from gist_tpu.ops.pallas_spmm import spmm_pallas_csr

    return spmm_pallas_csr(graph, x)


def aggregate(
    graph: Graph,
    x: jnp.ndarray,
    *,
    norm: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Aggregate neighbor features, optionally scaling rows by ``norm``
    afterwards (the ``ah * norm`` step of cluster_gcn/modules.py:226)."""
    backend = resolve_backend(graph, backend)
    if backend == "pallas":
        try:
            out = spmm_pallas(graph, x)
        except NotImplementedError:
            out = spmm_segment_chunked(graph, x)
    else:
        out = spmm_segment_chunked(graph, x)
    if norm is not None:
        if norm.ndim == 1:
            norm = norm[:, None]
        out = out * norm
    return out
