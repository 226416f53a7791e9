"""Pallas SpMM kernel vs the segment-sum oracle (interpreter mode on CPU;
the same kernel compiles natively on TPU — exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import dense_adj, make_random_graph

import gist_tpu.graph as G
from gist_tpu.ops.spmm import spmm_segment


def run_interpret(graph, x):
    from jax.experimental.pallas import tpu as pltpu

    from gist_tpu.ops import pallas_spmm

    with pltpu.force_tpu_interpret_mode():
        return pallas_spmm.spmm_pallas_csr(graph, x)


@pytest.mark.parametrize("n_nodes,n_edges,f", [
    (40, 200, 8),      # multiple chunks per tile? no — small everything
    (300, 2000, 16),   # several dst tiles
    (128, 100, 128),   # exact tile boundary, wide-ish features
])
def test_pallas_spmm_matches_segment(rng, n_nodes, n_edges, f):
    s, r = make_random_graph(rng, n_nodes, n_edges)
    g = G.graph_from_edges(s, r, n_nodes, tiles=True)
    x = jnp.asarray(rng.standard_normal((n_nodes, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(run_interpret(g, x))
    # hi/lo bf16 split accumulation: ~1e-6 relative per chunk
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_skewed_degrees(rng):
    """Hub node with in-degree >> chunk size exercises the multi-chunk
    loop inside one tile."""
    n, f = 64, 8
    hub_edges = 700
    s = rng.integers(0, n, size=hub_edges)
    r = np.full(hub_edges, 3)
    s2, r2 = make_random_graph(rng, n, 100, self_loops=False)
    g = G.graph_from_edges(np.concatenate([s, s2]), np.concatenate([r, r2]), n, tiles=True)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(run_interpret(g, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_grad(rng):
    n, f = 50, 8
    s, r = make_random_graph(rng, n, 250)
    g = G.graph_from_edges(s, r, n, tiles=True)
    A = dense_adj(s, r, n)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    w = rng.standard_normal((n, f)).astype(np.float32)

    from jax.experimental.pallas import tpu as pltpu

    from gist_tpu.ops import pallas_spmm

    with pltpu.force_tpu_interpret_mode():
        grad = jax.grad(
            lambda x: jnp.sum(pallas_spmm.spmm_pallas_csr(g, x) * w))(x)
    np.testing.assert_allclose(np.asarray(grad), A.T @ w, rtol=1e-4,
                               atol=1e-4)


def test_pallas_spmm_wide_features_tiled(rng):
    """F wide enough to force feature tiling (f_tile < F)."""
    from gist_tpu.ops import pallas_spmm as PS
    n, f = 64, 512
    s, r = make_random_graph(rng, n, 400)
    g = G.graph_from_edges(s, r, n, tiles=True)
    # force small f_tile by monkeypatching the picker
    orig = PS._pick_f_tile
    PS._pick_f_tile = lambda *a, **k: 128
    try:
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        want = np.asarray(spmm_segment(g, x))
        got = np.asarray(run_interpret(g, x))
    finally:
        PS._pick_f_tile = orig
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_bf16(rng):
    n, f = 64, 128
    s, r = make_random_graph(rng, n, 300)
    g = G.graph_from_edges(s, r, n, tiles=True)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(run_interpret(g, x.astype(jnp.bfloat16)))
    np.testing.assert_allclose(got.astype(np.float32), want, rtol=0.05,
                               atol=0.05)


def test_dedup_layout_built_by_default(rng):
    s, r = make_random_graph(rng, 300, 2000)
    g = G.graph_from_edges(s, r, 300, tiles=True)
    assert g.dedup is not None and g.dedup_t is not None
    d = g.dedup
    assert d.u_senders.shape[0] % d.cu == 0
    assert d.w_blocks.shape == (int(d.job_offsets[-1]), d.tile_rows, d.cu)
    # every edge is accounted once: total count mass == n_edges
    assert int(np.asarray(d.w_blocks, dtype=np.int64).sum()) == g.n_edges


def test_dedup_vs_gather_layouts_agree(rng):
    """v2 (dedup) and v1 (gather) kernels produce the same aggregation,
    including with the locality reordering active (n > 2*tile_rows)."""
    n, f = 400, 16
    s, r = make_random_graph(rng, n, 3000)
    g1 = G.graph_from_edges(s, r, n, tiles=True, tile_mode="gather")
    g2 = G.graph_from_edges(s, r, n, tiles=True)
    assert g2.dedup is not None and g2.dedup.pos is not None  # reordered
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g1, x))
    got1 = np.asarray(run_interpret(g1, x))
    got2 = np.asarray(run_interpret(g2, x))
    np.testing.assert_allclose(got1, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-4)


def test_dedup_multigraph_counts(rng):
    """Repeated edges must aggregate with multiplicity (int8 counts)."""
    n, f = 40, 8
    s = np.array([1, 1, 1, 2, 5, 5], dtype=np.int64)
    r = np.array([0, 0, 0, 0, 3, 3], dtype=np.int64)
    g = G.graph_from_edges(s, r, n, tiles=True)
    assert g.dedup is not None
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(run_interpret(g, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dedup_grad_with_reorder(rng):
    n, f = 300, 8
    s, r = make_random_graph(rng, n, 1500)
    g = G.graph_from_edges(s, r, n, tiles=True)
    assert g.dedup is not None
    A = dense_adj(s, r, n)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    w = rng.standard_normal((n, f)).astype(np.float32)

    from jax.experimental.pallas import tpu as pltpu

    from gist_tpu.ops import pallas_spmm

    with pltpu.force_tpu_interpret_mode():
        grad = jax.grad(
            lambda x: jnp.sum(pallas_spmm.spmm_pallas_csr(g, x) * w))(x)
    np.testing.assert_allclose(np.asarray(grad), A.T @ w, rtol=1e-4,
                               atol=1e-4)


def test_pallas_spmm_empty_tiles(rng):
    """Dst tiles with zero edges (nodes 128..255 receive nothing) must
    produce zero rows and not disturb their neighbors."""
    n, f = 256, 8
    s = rng.integers(0, n, 200)
    r = rng.integers(0, 100, 200)   # receivers only in tile 0
    g = G.graph_from_edges(s, r, n, tiles=True)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(run_interpret(g, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[128:], 0.0, atol=1e-6)


def test_chunked_dedup_matches_segment(rng):
    """The chunked v2 layout (huge-graph path: uniform tile chunks,
    bounded per-chunk gather) must agree with the segment oracle; also
    exercises the forced builder on a small graph."""
    n_nodes, n_edges, f = 600, 4000, 24
    s, r = make_random_graph(rng, n_nodes, n_edges)
    g = G.graph_from_edges(s, r, n_nodes)
    # force tiny chunks so several uniform chunks exist
    g = g.with_tiles(mode="dedup-chunked", chunk_rows=2048)
    assert g.dedup_c is not None and g.dedup_c.n_chunks > 1, (
        None if g.dedup_c is None else g.dedup_c.n_chunks)
    x = jnp.asarray(rng.standard_normal((n_nodes, f)).astype(np.float32))
    want = np.asarray(spmm_segment(g, x))
    got = np.asarray(run_interpret(g, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # backward (transpose chunked layout) through the custom VJP
    def loss(x):
        from gist_tpu.ops import pallas_spmm
        return jnp.sum(pallas_spmm.spmm_pallas_csr(g, x) ** 2)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        dx = np.asarray(jax.grad(loss)(x))
    A = dense_adj(s, r, n_nodes)
    want_dx = 2.0 * A.T @ (A @ np.asarray(x))
    np.testing.assert_allclose(dx, want_dx, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("threshold,chunk_rows,cu", [
    (4, 1 << 20, 1024),  # most pairs direct, single chunk
    (8, 2048, 1024),     # mixed direct/remote, many chunks
    (10**9, 4096, 1024),  # all-remote degenerate (pure gather, chunked)
    (8, 2048, 512),      # padding-trim block size
])
def test_split_chunked_matches_segment(rng, threshold, chunk_rows, cu):
    """The v3 direct/remote split layout (interpret mode) must match the
    segment oracle for any density threshold, including the all-remote
    degenerate case."""
    from jax.experimental.pallas import tpu as pltpu

    from gist_tpu.graph import _build_dedup_split_chunked
    from gist_tpu.ops.pallas_spmm import _run_dedup_split_chunked

    n, f = 3000, 16
    # dense pairs: hub receivers fed by one source block
    hub_r = np.repeat(rng.integers(0, n, 20), 30)
    hub_s = rng.integers(0, 1024, len(hub_r))
    # sparse scatter
    sc_s, sc_r = make_random_graph(rng, n, 4000)
    s = np.concatenate([hub_s, sc_s])
    r = np.concatenate([hub_r, sc_r])
    t = _build_dedup_split_chunked(s, r, n, tile_rows=64, cu=cu,
                                   threshold=threshold,
                                   chunk_rows=chunk_rows)
    assert t is not None and t.is_dir is not None
    if threshold < 10**9:
        assert t.is_dir.sum() > 0  # direct jobs exist
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    t = t.to_device()
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_run_dedup_split_chunked(t, x, n))
    g = G.graph_from_edges(s, r, n)
    want = np.asarray(spmm_segment(g, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_split_chunked_gather_savings(rng):
    """The split layout must gather strictly fewer rows than the v2
    layout's unique-slot count on a clustered graph."""
    from gist_tpu.graph import (_build_dedup_chunked,
                                _build_dedup_split_chunked)

    # clustered graph: communities of 64, mostly-internal edges
    n, k = 4096, 64
    comm = np.arange(n) // k
    s_list, r_list = [], []
    for _ in range(40):
        src = rng.integers(0, n, n)
        internal = rng.random(n) < 0.8
        dst = np.where(internal,
                       comm[src] * k + rng.integers(0, k, n),
                       rng.integers(0, n, n))
        s_list.append(src)
        r_list.append(dst)
    s, r = np.concatenate(s_list), np.concatenate(r_list)
    v2 = _build_dedup_chunked(s, r, n, tile_rows=64, chunk_rows=1 << 14)
    v3 = _build_dedup_split_chunked(s, r, n, tile_rows=64, threshold=64,
                                    chunk_rows=1 << 14)
    assert v2 is not None and v3 is not None
    gathered_v2 = int(np.prod(np.asarray(v2.u_senders).shape))
    gathered_v3 = int(np.prod(np.asarray(v3.u_senders).shape))
    assert gathered_v3 < gathered_v2, (gathered_v3, gathered_v2)
