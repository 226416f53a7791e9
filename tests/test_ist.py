"""IST partition sampling + dispatch/merge invariants.

Covers the silent assumptions of the reference engine: partition
disjointness/coverage (ist_distrib.py:135 'only works properly if there
is no overlap'), dispatch∘merge identity, and the unsplit-leaf averaging
semantics (train_ist.py:256-268)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_random_graph

import gist_tpu.graph as G
from gist_tpu.ist import sample_boundaries, boundary_sizes, dispatch, merge, dispatch_all
from gist_tpu.ist.partition import sample_partition
from gist_tpu.models import gcn, sage, gat


def test_sample_partition_disjoint_cover():
    for dim, k in [(16, 2), (64, 8), (12, 3)]:
        p = sample_partition(jax.random.PRNGKey(0), dim, k)
        assert p.shape == (k, dim // k)
        flat = np.sort(np.asarray(p).ravel())
        np.testing.assert_array_equal(flat, np.arange(dim))


def test_boundary_sizes_match_reference_feats_idx():
    # train_ist.py:150-166 builds [input?, hidden x (n_layers-1), output?]
    assert boundary_sizes(100, 64, 3, split_input=True, split_output=False) == \
        [100, 64, 64, None]
    assert boundary_sizes(100, 64, 1, split_input=False, split_output=True) == \
        [None, 64]
    assert boundary_sizes(100, 64, 2, split_input=False, split_output=False) == \
        [None, 64, None]


@pytest.mark.parametrize("kind,split_input,split_output", [
    ("gcn", False, False), ("gcn", True, True), ("gcn", False, True),
    ("sage", False, True), ("sage", False, False),
])
def test_dispatch_shapes_match_sub_model(kind, split_input, split_output):
    """Dispatched slices must have exactly the shapes the sub-model
    init produces (the state-dict-compatibility the reference gets via
    load_state_dict, train_ist.py:201)."""
    in_f, hid, ncls, n_layers, K = 20, 16, 5, 2, 4
    mod = {"gcn": gcn, "sage": sage}[kind]
    Cfg = {"gcn": gcn.GCNConfig, "sage": sage.SAGEConfig}[kind]
    cfg = Cfg(in_f, hid, ncls, n_layers=n_layers)
    full = mod.init(jax.random.PRNGKey(0), cfg)
    sub_cfg = cfg.sub_config(split_input=split_input,
                             split_output=split_output, num_subnet=K)
    expect = mod.init(jax.random.PRNGKey(1), sub_cfg)

    sizes = boundary_sizes(in_f, hid, n_layers, split_input=split_input,
                           split_output=split_output)
    bnds = sample_boundaries(jax.random.PRNGKey(2), sizes, K)
    for s in range(K):
        got = dispatch(full, bnds, s, kind=kind)
        got_shapes = jax.tree.map(jnp.shape, got)
        want_shapes = jax.tree.map(jnp.shape, expect)
        assert got_shapes == want_shapes


def test_dispatch_merge_roundtrip_identity():
    """Merging untouched dispatched shards must reproduce the full params
    exactly (every split entry is covered by exactly one subnet; unsplit
    leaves average K identical copies)."""
    for kind, Cfg, mod in [("gcn", gcn.GCNConfig, gcn),
                           ("sage", sage.SAGEConfig, sage)]:
        for split_input, split_output in [(False, False), (False, True),
                                          (True, True)]:
            if kind == "sage" and split_input:
                continue  # reference never splits SAGE input (distrib only)
            in_f, hid, ncls, n_layers, K = 12, 8, 3, 2, 2
            cfg = Cfg(in_f, hid, ncls, n_layers=n_layers)
            full = mod.init(jax.random.PRNGKey(0), cfg)
            sizes = boundary_sizes(in_f, hid, n_layers,
                                   split_input=split_input,
                                   split_output=split_output)
            bnds = sample_boundaries(jax.random.PRNGKey(3), sizes, K)
            stacked = dispatch_all(full, bnds, K, kind=kind)
            back = merge(full, bnds, stacked, K, kind=kind)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
                full, back)


def test_merge_scatters_trained_values():
    """Modified shards land in exactly the dispatched positions."""
    in_f, hid, ncls, n_layers, K = 10, 8, 3, 2, 2
    cfg = gcn.GCNConfig(in_f, hid, ncls, n_layers=n_layers)
    full = gcn.init(jax.random.PRNGKey(0), cfg)
    sizes = boundary_sizes(in_f, hid, n_layers, split_input=False,
                           split_output=True)
    bnds = sample_boundaries(jax.random.PRNGKey(1), sizes, K)
    stacked = dispatch_all(full, bnds, K, kind="gcn")
    bumped = jax.tree.map(lambda x: x + 1.0, stacked)
    merged = merge(full, bnds, bumped, K, kind="gcn")
    # every split weight entry is +1; run dispatch again and compare
    re = dispatch_all(merged, bnds, K, kind="gcn")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b) + 1.0, rtol=1e-6),
        re, stacked)


def test_gat_dispatch_merge_roundtrip():
    in_f, hid, ncls, K = 10, 8, 3, 2
    cfg = gat.GATConfig(in_f, hid, ncls, n_layers=3, n_heads=2)
    full = gat.init(jax.random.PRNGKey(0), cfg)
    # GAT partitions every hidden boundary (n_layers-1 of them),
    # no input/output split (ist_distrib_gat.py:88-94)
    sizes = [None] + [hid] * (cfg.n_layers - 1) + [None]
    # NB boundary list for GAT: len = n_layers+1 over n_layers weight layers
    bnds = sample_boundaries(jax.random.PRNGKey(1), sizes[:cfg.n_layers + 1], K)
    sub_cfg = cfg.sub_config(num_subnet=K)
    expect = gat.init(jax.random.PRNGKey(2), sub_cfg)
    got = dispatch(full, bnds, 0, kind="gat")
    assert jax.tree.map(jnp.shape, got) == jax.tree.map(jnp.shape, expect)
    stacked = dispatch_all(full, bnds, K, kind="gat")
    back = merge(full, bnds, stacked, K, kind="gat")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        full, back)


def test_sub_model_forward_with_dispatched_params(rng):
    """Dispatched params must run through the sub-model apply fn."""
    s, r = make_random_graph(rng, 20, 80)
    g = G.graph_from_edges(s, r, 20)
    in_f, hid, ncls, n_layers, K = 6, 8, 3, 2, 2
    cfg = sage.SAGEConfig(in_f, hid, ncls, n_layers=n_layers)
    full = sage.init(jax.random.PRNGKey(0), cfg)
    sizes = boundary_sizes(in_f, hid, n_layers, split_input=False,
                           split_output=True)
    bnds = sample_boundaries(jax.random.PRNGKey(1), sizes, K)
    sub_cfg = cfg.sub_config(split_input=False, split_output=True,
                             num_subnet=K)
    x = jnp.asarray(rng.standard_normal((20, in_f)).astype(np.float32))
    for s_id in range(K):
        sub = dispatch(full, bnds, s_id, kind="sage")
        out = sage.apply(sub, g, x, sub_cfg)
        assert out.shape == (20, ncls)
        assert np.isfinite(np.asarray(out)).all()


def test_non_divisible_partition_disjoint_cover():
    """dim % K != 0: rows are ceil(dim/K) wide, real ids cover
    range(dim) exactly once, padding entries are VIRTUAL_IDX."""
    from gist_tpu.ist.partition import VIRTUAL_IDX, sample_partition

    part = np.asarray(sample_partition(jax.random.PRNGKey(0), 10, 3))
    assert part.shape == (3, 4)
    real = part[part < 10]
    assert sorted(real.tolist()) == list(range(10))
    assert (part[part >= 10] == VIRTUAL_IDX).all()
    assert (part >= 10).sum() == 2


def test_non_divisible_dispatch_merge_identity():
    """dispatch_all then merge over non-divisible widths reproduces the
    full params exactly for sage and gat (virtual units read zeros and
    their updates are dropped)."""
    import jax.numpy as jnp

    from gist_tpu.models import gat as gat_m, sage as sage_m

    K = 3
    scfg = sage_m.SAGEConfig(11, 20, 5, n_layers=2)
    params = sage_m.init(jax.random.PRNGKey(1), scfg)
    sizes = boundary_sizes(11, 20, 2, split_input=False, split_output=True)
    bnds = sample_boundaries(jax.random.PRNGKey(2), sizes, K)
    sub = dispatch_all(params, bnds, K, kind="sage")
    assert sub["layers"][1]["w"].shape == (K, 2 * 7, 7)  # ceil(20/3)=7
    merged = merge(params, bnds, sub, K, kind="sage")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b)), merged, params)

    gcfg = gat_m.GATConfig(11, 20, 5, n_layers=2, n_heads=2)
    gparams = gat_m.init(jax.random.PRNGKey(3), gcfg)
    gsizes = [None, 20, None]
    gbnds = sample_boundaries(jax.random.PRNGKey(4), gsizes, K)
    gsub = dispatch_all(gparams, gbnds, K, kind="gat")
    gmerged = merge(gparams, gbnds, gsub, K, kind="gat")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b)), gmerged, gparams)


def test_non_divisible_host_dispatch_merge_identity():
    """The ultra-wide host-numpy dispatch/merge honors the same
    virtual-padding contract."""
    from gist_tpu.ist.ultrawide import (dispatch_host, merge_host,
                                        sample_boundaries_host)
    from gist_tpu.models import sage as sage_m

    K = 3
    scfg = sage_m.SAGEConfig(11, 20, 5, n_layers=2)
    params = jax.tree.map(
        lambda a: np.array(a, copy=True),
        sage_m.init(jax.random.PRNGKey(5), scfg))
    ref = jax.tree.map(np.copy, params)
    sizes = boundary_sizes(11, 20, 2, split_input=False, split_output=True)
    rng = np.random.default_rng(0)
    bnds = sample_boundaries_host(rng, sizes, K)
    assert bnds[1].shape == (K, 7)
    sub = dispatch_host(params, bnds, K, kind="sage")
    merged = merge_host(params, bnds, sub, K, kind="sage")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 merged, ref)
