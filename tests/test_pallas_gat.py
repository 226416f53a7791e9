"""Fused GAT attention kernel vs the XLA composite (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_random_graph

import gist_tpu.graph as G
from gist_tpu.ops.pallas_gat import _xla_reference, gat_attention_pallas


def run_interpret(fn, *args):
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("n,e,d", [(40, 200, 8), (300, 1500, 16)])
def test_gat_kernel_matches_xla(rng, n, e, d):
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="gather")
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    want = np.asarray(_xla_reference(g, z, a, b, 0.01))
    got = np.asarray(run_interpret(
        lambda: gat_attention_pallas(g, z, a, b, 0.01)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("n,e,d", [(50, 250, 8), (300, 1500, 16)])
def test_gat_kernel_grad_matches_xla(rng, n, e, d):
    from gist_tpu.ops.pallas_gat import set_gat_backward
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="gather")
    assert g.tiled.pos_in_other is not None
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def loss_pal(z, a, b):
        return jnp.sum(gat_attention_pallas(g, z, a, b, 0.01) * w)

    def loss_xla(z, a, b):
        return jnp.sum(_xla_reference(g, z, a, b, 0.01) * w)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(z, a, b)
    try:
        # xla-recompute backward: exact match
        set_gat_backward("xla")
        got = run_interpret(
            lambda: jax.grad(loss_pal, argnums=(0, 1, 2))(z, a, b))
        for gg, ww in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                       rtol=1e-4, atol=1e-5)
        # fused two-kernel backward: bf16-matmul tolerance
        set_gat_backward("fused")
        got_f = run_interpret(
            lambda: jax.grad(loss_pal, argnums=(0, 1, 2))(z, a, b))
        for gg, ww in zip(got_f, want):
            ww = np.asarray(ww)
            scale = np.abs(ww).max() + 1e-6
            np.testing.assert_allclose(np.asarray(gg) / scale, ww / scale,
                                       atol=2e-2)
    finally:
        set_gat_backward("fused")


def test_gat_fused_grad_finite_with_empty_rows(rng):
    """Isolated nodes / empty tiles must not poison the fused backward
    with NaNs (padding edges gather m = -inf rows)."""
    from gist_tpu.ops.pallas_gat import set_gat_backward
    n, d = 260, 8
    s = rng.integers(0, 40, 150)
    r = rng.integers(0, 40, 150)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="gather")
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    set_gat_backward("fused")
    grads = run_interpret(lambda: jax.grad(
        lambda z, a, b: jnp.sum(gat_attention_pallas(g, z, a, b, 0.01) * w),
        argnums=(0, 1, 2))(z, a, b))
    for gg in grads:
        assert np.isfinite(np.asarray(gg)).all()


def test_gat_kernel_empty_rows(rng):
    """Nodes with no in-edges must produce zero rows, not NaN."""
    n, d = 20, 4
    s = np.array([0, 1, 2])
    r = np.array([5, 5, 6])
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="gather")
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    out = np.asarray(run_interpret(
        lambda: gat_attention_pallas(g, z, a, b, 0.01)))
    assert np.isfinite(out).all()
    mask = np.ones(n, bool)
    mask[[5, 6]] = False
    np.testing.assert_allclose(out[mask], 0.0, atol=1e-7)


def test_gat_model_pallas_backend_matches_segment(rng):
    """gat.apply(backend='pallas') == backend='segment' on a tiled graph."""
    from gist_tpu.models import gat as gat_model
    n = 60
    s, r = make_random_graph(rng, n, 300)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="gather")
    cfg = gat_model.GATConfig(in_feats=8, n_hidden=8, n_classes=3,
                              n_layers=2, n_heads=2)
    params = gat_model.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    want = np.asarray(gat_model.apply(params, g, x, cfg))
    got = np.asarray(run_interpret(
        lambda: gat_model.apply(params, g, x, cfg, backend="pallas")))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_gat_kernel_empty_trailing_tiles(rng):
    """Receivers confined to the first tile: trailing tiles have zero
    edges and must not index past the edge blocks."""
    n, d = 256, 8
    s = rng.integers(0, n, 150)
    r = rng.integers(0, 100, 150)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="gather")
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    want = np.asarray(_xla_reference(g, z, a, b, 0.01))
    got = np.asarray(run_interpret(
        lambda: gat_attention_pallas(g, z, a, b, 0.01)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(got[128:], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Dedup-layout fused attention (round 4)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,e,d", [(40, 200, 8), (300, 1500, 16),
                                   (700, 4000, 32)])
def test_gat_dedup_kernel_matches_xla(rng, n, e, d):
    from gist_tpu.ops.pallas_gat import gat_attention_dedup
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    assert g.dedup is not None, "dedup layout must build at this scale"
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    want = np.asarray(_xla_reference(g, z, a, b, 0.01))
    got = np.asarray(run_interpret(
        lambda: gat_attention_dedup(g, z, a, b, 0.01)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_gat_dedup_multi_edges_and_empty_rows(rng):
    """Parallel edges multiply probabilities via the count block;
    isolated nodes yield zero rows, not NaN."""
    from gist_tpu.ops.pallas_gat import gat_attention_dedup
    n, d = 150, 8
    s = np.array([0, 0, 0, 1, 2, 3, 3])     # 3 parallel 0->5, 2x 3->6
    r = np.array([5, 5, 5, 5, 6, 6, 6])
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    want = np.asarray(_xla_reference(g, z, a, b, 0.01))
    got = np.asarray(run_interpret(
        lambda: gat_attention_dedup(g, z, a, b, 0.01)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    mask = np.ones(n, bool)
    mask[[5, 6]] = False
    np.testing.assert_allclose(got[mask], 0.0, atol=1e-7)


def test_gat_dedup_grad_matches_xla(rng):
    from gist_tpu.ops.pallas_gat import gat_attention_dedup, \
        set_gat_backward
    n, e, d = 300, 1500, 16
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    assert g.dedup_t is not None
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def loss_pal(z, a, b):
        return jnp.sum(gat_attention_dedup(g, z, a, b, 0.01) * w)

    def loss_xla(z, a, b):
        return jnp.sum(_xla_reference(g, z, a, b, 0.01) * w)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(z, a, b)
    try:
        # xla-recompute backward: exact match
        set_gat_backward("xla")
        got = run_interpret(
            lambda: jax.grad(loss_pal, argnums=(0, 1, 2))(z, a, b))
        for gg, ww in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                       rtol=1e-4, atol=1e-5)
        # fused two-kernel dedup backward: bf16-matmul tolerance
        set_gat_backward("fused")
        got_f = run_interpret(
            lambda: jax.grad(loss_pal, argnums=(0, 1, 2))(z, a, b))
        for gg, ww in zip(got_f, want):
            ww = np.asarray(ww)
            scale = np.abs(ww).max() + 1e-6
            np.testing.assert_allclose(np.asarray(gg) / scale, ww / scale,
                                       atol=2e-2)
    finally:
        set_gat_backward("fused")


def test_gat_dedup_fused_grad_finite_with_empty_rows(rng):
    """Isolated nodes / empty tiles must not poison the fused dedup
    backward with NaNs."""
    from gist_tpu.ops.pallas_gat import gat_attention_dedup
    n, d = 260, 8
    s = rng.integers(0, 40, 150)
    r = rng.integers(0, 40, 150)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    grads = run_interpret(lambda: jax.grad(
        lambda z, a, b: jnp.sum(gat_attention_dedup(g, z, a, b, 0.01) * w),
        argnums=(0, 1, 2))(z, a, b))
    for gg in grads:
        assert np.isfinite(np.asarray(gg)).all()


def test_gat_model_pallas_dedup_backend_matches_segment(rng):
    """gat.apply(backend='pallas') routes through the dedup attention
    kernel when the graph carries the dedup layout."""
    from gist_tpu.models import gat as gat_model
    n = 60
    s, r = make_random_graph(rng, n, 300)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    assert g.dedup is not None and g.tiled is None
    cfg = gat_model.GATConfig(in_feats=8, n_hidden=8, n_classes=3,
                              n_layers=2, n_heads=2)
    params = gat_model.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    want = np.asarray(gat_model.apply(params, g, x, cfg))
    got = np.asarray(run_interpret(
        lambda: gat_model.apply(params, g, x, cfg, backend="pallas")))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_gat_dedup_kernel_bfloat16_messages(rng):
    """bf16 z rides the single-matmul fast path and stays within bf16
    tolerance of the fp32 XLA composite."""
    from gist_tpu.ops.pallas_gat import gat_attention_dedup
    n, e, d = 300, 1500, 16
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    z = rng.standard_normal((n, d)).astype(np.float32)
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    want = np.asarray(_xla_reference(g, jnp.asarray(z), a, b, 0.01))
    got = np.asarray(run_interpret(
        lambda: gat_attention_dedup(g, jnp.asarray(z, jnp.bfloat16),
                                    a, b, 0.01)))
    np.testing.assert_allclose(got.astype(np.float32), want,
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("heads,o", [(2, 16), (3, 8)])
def test_gat_dedup_multihead_matches_per_head(rng, heads, o):
    """The batched multi-head kernel == per-head XLA composite for
    every head (one gather + one w read serve all heads)."""
    from gist_tpu.ops.pallas_gat import gat_attention_dedup_mh
    n, e = 300, 1500
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    z = jnp.asarray(rng.standard_normal((n, heads, o)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    got = np.asarray(run_interpret(
        lambda: gat_attention_dedup_mh(g, z, a, b, 0.01)))
    assert got.shape == (n, heads, o)
    for h in range(heads):
        want = np.asarray(_xla_reference(g, z[:, h], a[:, h], b[:, h],
                                         0.01))
        np.testing.assert_allclose(got[:, h], want, rtol=5e-3, atol=5e-3)


def test_gat_dedup_multihead_grad(rng):
    from gist_tpu.ops.pallas_gat import gat_attention_dedup_mh
    n, e, heads, o = 300, 1500, 2, 16
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    z = jnp.asarray(rng.standard_normal((n, heads, o)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((n, heads, o)).astype(np.float32))

    def loss_pal(z, a, b):
        return jnp.sum(gat_attention_dedup_mh(g, z, a, b, 0.01) * w)

    def loss_xla(z, a, b):
        per = [jnp.sum(_xla_reference(g, z[:, h], a[:, h], b[:, h], 0.01)
                       * w[:, h]) for h in range(heads)]
        return sum(per)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(z, a, b)
    got = run_interpret(
        lambda: jax.grad(loss_pal, argnums=(0, 1, 2))(z, a, b))
    for gg, ww in zip(got, want):
        ww = np.asarray(ww)
        scale = np.abs(ww).max() + 1e-6
        np.testing.assert_allclose(np.asarray(gg) / scale, ww / scale,
                                   atol=2e-2)


def test_gat_model_multihead_dedup_matches_segment(rng):
    """gat.apply routes multi-head through the batched dedup kernel."""
    from gist_tpu.models import gat as gat_model
    n = 300
    s, r = make_random_graph(rng, n, 1500)
    g = G.graph_from_edges(s, r, n, tiles=True, tile_mode="dedup")
    cfg = gat_model.GATConfig(in_feats=8, n_hidden=12, n_classes=3,
                              n_layers=2, n_heads=3)
    params = gat_model.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    want = np.asarray(gat_model.apply(params, g, x, cfg))
    got = np.asarray(run_interpret(
        lambda: gat_model.apply(params, g, x, cfg, backend="pallas")))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_gat_dedup_chunked_matches_xla(rng):
    """Chunked dedup attention (>HBM-scale layout, graph.dedup_c) ==
    the XLA composite, multi-head, on a small graph forced into many
    chunks (tiny chunk_rows)."""
    from gist_tpu.ops.pallas_gat import gat_attention_dedup_chunked
    n, e, d, heads = 300, 1500, 8, 2
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n)
    g = g.with_tiles(tile_rows=128, mode="dedup-chunked",
                     chunk_rows=2048)
    assert g.dedup_c is not None and g.dedup_c.n_chunks > 1, \
        (g.dedup_c and g.dedup_c.n_chunks)
    z = jnp.asarray(rng.standard_normal((n, heads, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    want = np.stack([np.asarray(_xla_reference(
        g, z[:, h], a[:, h], b[:, h], 0.01)) for h in range(heads)],
        axis=1)
    got = np.asarray(run_interpret(
        lambda: gat_attention_dedup_chunked(g, z, a, b, 0.01)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_gat_dedup_chunked_grad_matches_xla(rng):
    """The chunked layout's backward (exact XLA recompute per head)."""
    from gist_tpu.ops.pallas_gat import gat_attention_dedup_chunked
    n, e, d, heads = 200, 900, 8, 2
    s, r = make_random_graph(rng, n, e)
    g = G.graph_from_edges(s, r, n)
    g = g.with_tiles(tile_rows=128, mode="dedup-chunked",
                     chunk_rows=2048)
    assert g.dedup_c is not None
    z = jnp.asarray(rng.standard_normal((n, heads, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, heads, d)).astype(np.float32))

    def loss_chunk(z, a, b):
        return jnp.sum(gat_attention_dedup_chunked(g, z, a, b, 0.01) * w)

    def loss_xla(z, a, b):
        per = [jnp.sum(_xla_reference(g, z[:, h], a[:, h], b[:, h], 0.01)
                       * w[:, h]) for h in range(heads)]
        return sum(per)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(z, a, b)
    got = run_interpret(
        lambda: jax.grad(loss_chunk, argnums=(0, 1, 2))(z, a, b))
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=1e-4, atol=1e-5)


def test_gat_model_chunked_dedup_matches_segment(rng):
    """gat.apply routes through the chunked kernel when only dedup_c
    is present (the >HBM full-graph eval path)."""
    from gist_tpu.models import gat as gat_model
    n = 300
    s, r = make_random_graph(rng, n, 1500)
    g = G.graph_from_edges(s, r, n)
    gc = g.with_tiles(tile_rows=128, mode="dedup-chunked",
                      chunk_rows=2048)
    assert gc.dedup_c is not None and gc.dedup is None
    cfg = gat_model.GATConfig(in_feats=8, n_hidden=12, n_classes=3,
                              n_layers=2, n_heads=3)
    params = gat_model.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    want = np.asarray(gat_model.apply(params, g, x, cfg))
    got = np.asarray(run_interpret(
        lambda: gat_model.apply(params, gc, x, cfg, backend="pallas")))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_with_tiles_forward_only_chunked(rng):
    """transpose=False skips the transpose chunked layout — the
    forward-only eval consumer must not pay double W HBM."""
    s, r = make_random_graph(rng, 100, 400)
    g = G.graph_from_edges(s, r, 100, numpy=True)
    gc = g.with_tiles(mode="dedup-chunked", chunk_rows=1024,
                      transpose=False)
    assert gc.dedup_c is not None and gc.dedup_c_t is None
