"""Graph container + aggregation kernels vs dense numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import dense_adj, make_random_graph

import gist_tpu.graph as G
from gist_tpu.ops import aggregate, segment_softmax, spmm_segment
from gist_tpu.ops.segment import sddmm_concat, segment_weighted_sum


def build(rng, n_nodes=40, n_edges=200):
    s, r = make_random_graph(rng, n_nodes, n_edges)
    g = G.graph_from_edges(s, r, n_nodes)
    return g, s, r


def test_graph_from_edges_padding(rng):
    s, r = make_random_graph(rng, 10, 17, self_loops=False)
    g = G.graph_from_edges(s, r, 10, edge_pad_multiple=32)
    assert g.n_edges == 17
    assert g.n_edges_padded == 32
    # padding receivers out of range
    assert np.all(np.asarray(g.receivers[17:]) == 10)
    # receiver-sorted
    assert np.all(np.diff(np.asarray(g.receivers[:17])) >= 0)
    # indptr consistent
    indptr = np.asarray(g.indptr)
    assert indptr[0] == 0 and indptr[-1] == 17
    counts = np.bincount(r, minlength=10)
    assert np.array_equal(np.diff(indptr), counts)


def test_spmm_matches_dense(rng):
    g, s, r = build(rng)
    A = dense_adj(s, r, g.n_nodes)
    x = rng.standard_normal((g.n_nodes, 16)).astype(np.float32)
    out = spmm_segment(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), A @ x, rtol=1e-5, atol=1e-5)


def test_spmm_grad_matches_dense(rng):
    g, s, r = build(rng, n_nodes=20, n_edges=60)
    A = dense_adj(s, r, g.n_nodes)
    x = rng.standard_normal((g.n_nodes, 8)).astype(np.float32)
    w = rng.standard_normal((g.n_nodes, 8)).astype(np.float32)

    def f(x):
        return jnp.sum(spmm_segment(g, x) * w)

    grad = jax.grad(f)(jnp.asarray(x))
    # d/dx sum((A x) * w) = A^T w
    np.testing.assert_allclose(np.asarray(grad), A.T @ w, rtol=1e-5, atol=1e-5)


def test_aggregate_norm(rng):
    g, s, r = build(rng)
    A = dense_adj(s, r, g.n_nodes)
    x = rng.standard_normal((g.n_nodes, 4)).astype(np.float32)
    inv_deg = np.zeros(g.n_nodes)
    deg = A.sum(axis=1)
    inv_deg[deg > 0] = 1.0 / deg[deg > 0]
    out = aggregate(g, jnp.asarray(x), norm=G.inv_degree_norm(g))
    np.testing.assert_allclose(np.asarray(out), (A @ x) * inv_deg[:, None],
                               rtol=1e-5, atol=1e-5)


def test_segment_softmax_sums_to_one(rng):
    g, s, r = build(rng)
    scores = jnp.asarray(rng.standard_normal(g.n_edges_padded).astype(np.float32))
    alpha = segment_softmax(g, scores)
    sums = jax.ops.segment_sum(alpha, g.receivers, num_segments=g.n_nodes)
    deg = np.asarray(g.in_degrees)
    got = np.asarray(sums)
    np.testing.assert_allclose(got[deg > 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(got[deg == 0], 0.0, atol=1e-6)
    # padding edges got zero weight
    pad = np.asarray(alpha)[g.n_edges:]
    np.testing.assert_allclose(pad, 0.0, atol=1e-7)


def test_segment_softmax_matches_numpy(rng):
    g, s, r = build(rng, n_nodes=15, n_edges=40)
    scores = rng.standard_normal(g.n_edges_padded).astype(np.float32)
    alpha = np.asarray(segment_softmax(g, jnp.asarray(scores)))
    recv = np.asarray(g.receivers)
    for node in range(g.n_nodes):
        idx = np.nonzero(recv == node)[0]
        if len(idx) == 0:
            continue
        e = np.exp(scores[idx] - scores[idx].max())
        np.testing.assert_allclose(alpha[idx], e / e.sum(), rtol=1e-4)


def test_gat_edge_pipeline_matches_dense(rng):
    """sddmm + softmax + weighted sum == dense attention over adjacency."""
    n, d = 12, 6
    s, r = make_random_graph(rng, n, 50, self_loops=True)
    # dedupe edges so dense softmax comparison is well-defined
    pairs = np.unique(np.stack([s, r], 1), axis=0)
    s, r = pairs[:, 0], pairs[:, 1]
    g = G.graph_from_edges(s, r, n)
    z = rng.standard_normal((n, d)).astype(np.float32)
    al = rng.standard_normal(d).astype(np.float32)
    ar = rng.standard_normal(d).astype(np.float32)

    scores = sddmm_concat(g, jnp.asarray(z), jnp.asarray(al), jnp.asarray(ar))
    alpha = segment_softmax(g, scores)
    out = segment_weighted_sum(g, jnp.asarray(z), alpha)

    # dense oracle
    S = z @ al  # source scores
    R = z @ ar
    E = S[None, :] + R[:, None]          # E[r, s]
    adj = dense_adj(s, r, n) > 0
    E = np.where(adj, E, -np.inf)
    E = E - E.max(axis=1, keepdims=True)
    W = np.exp(E) * adj
    W = W / np.maximum(W.sum(axis=1, keepdims=True), 1e-38)
    np.testing.assert_allclose(np.asarray(out), W @ z, rtol=1e-4, atol=1e-5)


def test_subgraph_relabel():
    s = np.array([0, 1, 2, 3, 4, 0])
    r = np.array([1, 2, 3, 4, 0, 2])
    ss, rr, ids = G.subgraph(s, r, [0, 1, 2], 5)
    # edges kept: 0->1, 1->2, 0->2 (both ends in {0,1,2})
    assert sorted(zip(ss.tolist(), rr.tolist())) == [(0, 1), (0, 2), (1, 2)]


def test_spmm_chunked_matches_unchunked(rng):
    g, s, r = build(rng, n_nodes=60, n_edges=500)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 8)).astype(np.float32))
    from gist_tpu.ops import spmm_segment_chunked
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(spmm_segment_chunked(g, x, edge_chunk=64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spmm_chunked_grad(rng):
    from conftest import dense_adj
    g, s, r = build(rng, n_nodes=30, n_edges=200)
    A = dense_adj(s, r, g.n_nodes)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 4)).astype(np.float32))
    w = rng.standard_normal((g.n_nodes, 4)).astype(np.float32)
    from gist_tpu.ops import spmm_segment_chunked
    grad = jax.grad(lambda x: jnp.sum(
        spmm_segment_chunked(g, x, edge_chunk=64) * w))(x)
    np.testing.assert_allclose(np.asarray(grad), A.T @ w, rtol=1e-4,
                               atol=1e-4)


def test_with_tiles_roundtrip(rng):
    g, s, r = build(rng, n_nodes=50, n_edges=300)
    assert g.tiled is None and g.dedup is None
    g2 = g.with_tiles(mode="gather")
    assert g2.tiled is not None and g2.tiled_t is not None
    # tiles built lazily match tiles built at construction
    g3 = G.graph_from_edges(s, r, 50, tiles=True, tile_mode="gather")
    np.testing.assert_array_equal(np.asarray(g2.tiled.senders),
                                  np.asarray(g3.tiled.senders))
    np.testing.assert_array_equal(np.asarray(g2.tiled_t.receivers),
                                  np.asarray(g3.tiled_t.receivers))
    assert g2.with_tiles(mode="gather") is g2  # no-op when present
    # default mode builds the v2 dedup layout
    g4 = g.with_tiles()
    assert g4.dedup is not None and g4.dedup_t is not None
    assert g4.with_tiles() is g4


def test_aggregate_pallas_falls_back_without_tiles(rng):
    g, s, r = build(rng, n_nodes=30, n_edges=100)  # no tiles
    x = jnp.asarray(rng.standard_normal((30, 8)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(aggregate(g, x, backend="pallas"))  # silently degrades
    np.testing.assert_allclose(got, want, rtol=1e-6)
