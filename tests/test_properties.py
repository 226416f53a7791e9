"""Property-based tests (hypothesis) for the IST invariants and graph
construction — the silently-assumed invariants of the reference
(disjointness, ist_distrib.py:135) under randomized inputs."""

import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import gist_tpu.graph as G
from gist_tpu.ist import boundary_sizes, dispatch_all, merge, sample_boundaries
from gist_tpu.ist.partition import sample_partition
from gist_tpu.models import sage

settings.register_profile("ci", max_examples=20, deadline=None)
settings.load_profile("ci")


@given(st.integers(1, 6), st.integers(1, 8), st.integers(0, 2 ** 31 - 1))
def test_partition_always_disjoint_cover(chunks_per, k, seed):
    dim = chunks_per * k
    p = sample_partition(jax.random.PRNGKey(seed), dim, k)
    flat = np.sort(np.asarray(p).ravel())
    np.testing.assert_array_equal(flat, np.arange(dim))


@given(st.integers(2, 4), st.integers(1, 3), st.booleans(),
       st.integers(0, 10 ** 6))
def test_dispatch_merge_identity_property(k, n_layers, split_output, seed):
    in_f = 4 * k
    hid = 4 * k
    cfg = sage.SAGEConfig(in_f, hid, 3, n_layers=n_layers)
    full = sage.init(jax.random.PRNGKey(seed % 1000), cfg)
    sizes = boundary_sizes(in_f, hid, n_layers, split_input=False,
                           split_output=split_output)
    bnds = sample_boundaries(jax.random.PRNGKey(seed), sizes, k)
    stacked = dispatch_all(full, bnds, k, kind="sage")
    back = merge(full, bnds, stacked, k, kind="sage")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        full, back)


@given(st.integers(2, 40), st.integers(0, 120), st.integers(0, 2 ** 31 - 1))
def test_graph_from_edges_properties(n, e, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    g = G.graph_from_edges(s, r, n)
    assert g.n_edges == e
    indptr = np.asarray(g.indptr)
    assert indptr[-1] == e
    # degrees consistent with edges
    np.testing.assert_array_equal(np.asarray(g.in_degrees),
                                  np.bincount(r, minlength=n)[:n])
    # transpose is an involution on real edges: aggregating ones gives
    # in-degrees on the forward graph and out-degrees on the transpose
    from gist_tpu.ops.spmm import spmm_segment
    ones = jnp.ones((n, 1))
    np.testing.assert_allclose(
        np.asarray(spmm_segment(g, ones))[:, 0],
        np.asarray(g.in_degrees), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(spmm_segment(g.transpose(), ones))[:, 0],
        np.asarray(g.out_degrees), rtol=1e-6)


@given(st.integers(2, 30), st.integers(1, 80), st.integers(2, 4),
       st.integers(0, 2 ** 31 - 1))
def test_sharded_build_covers_all_edges(n, e, d, seed):
    from gist_tpu.parallel import build_sharded_graph
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    sg = build_sharded_graph(s, r, n, d, seed=seed % 97)
    # every real edge appears on exactly one device
    real = int((np.asarray(sg.receivers) < sg.n_loc_pad).sum())
    assert real == e
    # interior + boundary partition the same edges
    ri = int((np.asarray(sg.int_receivers) < sg.n_loc_pad).sum())
    rb = int((np.asarray(sg.bnd_receivers) < sg.n_loc_pad).sum())
    assert ri + rb == e
