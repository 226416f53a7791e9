"""Edge-partitioned multi-device aggregation vs the dense oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from conftest import dense_adj, make_random_graph

from gist_tpu.parallel import (ShardedGraph, build_sharded_graph,
                               sharded_aggregate)
from gist_tpu.parallel.graph_shard import shard_features, unshard


def make_mesh(d):
    return Mesh(np.asarray(jax.devices()[:d]), ("graph",))


@pytest.mark.parametrize("n_nodes,n_edges,d", [(50, 300, 4), (64, 200, 8),
                                               (33, 101, 2)])
def test_sharded_aggregate_matches_dense(rng, n_nodes, n_edges, d):
    s, r = make_random_graph(rng, n_nodes, n_edges)
    sg = build_sharded_graph(s, r, n_nodes, d)
    mesh = make_mesh(d)
    x = rng.standard_normal((n_nodes, 16)).astype(np.float32)
    xs = shard_features(sg, x, mesh)
    agg = sharded_aggregate(sg, mesh)
    y = unshard(sg, agg(xs))
    A = dense_adj(s, r, n_nodes)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-5, atol=1e-5)


def test_halo_sizes_reasonable(rng):
    """With a locality partitioner on a clustered graph the halo should
    be far smaller than full replication."""
    from gist_tpu.data import synthetic_dataset
    ds = synthetic_dataset("synth-tiny")
    d = 4
    sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
    # synth-tiny is a small dense-ish random graph with little locality,
    # so only require the trivial bound; the lattice test below checks
    # the locality win properly
    assert sg.halo_pad * d <= ds.n_nodes, (sg.halo_pad, ds.n_nodes)


def test_halo_small_on_lattice():
    """On a graph with locality (1-D lattice, +-3 neighbors) the BFS
    partitioner keeps halos tiny vs full replication."""
    n, d = 512, 4
    s, r = [], []
    for k in range(1, 4):
        idx = np.arange(n)
        s += [idx, (idx + k) % n]
        r += [(idx + k) % n, idx]
    s, r = np.concatenate(s), np.concatenate(r)
    sg = build_sharded_graph(s, r, n, d)
    assert sg.halo_pad * d < n // 4, (sg.halo_pad, n)


def test_sharded_sage_layer_matches_single_device(rng):
    """A SAGE layer computed with sharded aggregation equals the
    single-device layer."""
    import gist_tpu.graph as G
    from gist_tpu.models.layers import sage_layer
    from gist_tpu.models import sage

    n, d, f = 48, 4, 12
    s, r = make_random_graph(rng, n, 250)
    sg = build_sharded_graph(s, r, n, d)
    mesh = make_mesh(d)
    x = rng.standard_normal((n, f)).astype(np.float32)

    # single device reference
    g = G.graph_from_edges(s, r, n)
    cfg = sage.SAGEConfig(f, 8, 3, n_layers=0)
    params = sage.init(jax.random.PRNGKey(0), cfg)
    layer = params["layers"][0]
    want = sage_layer(g, jnp.asarray(x), layer, use_layer_norm=False)

    # sharded: aggregate then the dense part per node (dense ops are
    # row-parallel, so just run them on the unsharded result)
    xs = shard_features(sg, x, mesh)
    agg = sharded_aggregate(sg, mesh)
    ah = unshard(sg, agg(xs))
    inv = np.where(np.asarray(g.in_degrees) > 0,
                   1.0 / np.maximum(np.asarray(g.in_degrees), 1), 0.0)
    h = jnp.concatenate([jnp.asarray(x), ah * inv[:, None]], axis=1)
    got = h @ layer["w"] + layer["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_all_halo_variants_agree(rng):
    """ring (default), a2a-overlapped, and plain a2a all equal the dense
    oracle."""
    n, d = 50, 4
    s, r = make_random_graph(rng, n, 300)
    sg = build_sharded_graph(s, r, n, d)
    mesh = make_mesh(d)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    xs = shard_features(sg, x, mesh)
    y_plain = unshard(sg, sharded_aggregate(sg, mesh, overlapped=False,
                                            ring=False)(xs))
    y_ov = unshard(sg, sharded_aggregate(sg, mesh, overlapped=True,
                                         ring=False)(xs))
    y_ring = unshard(sg, sharded_aggregate(sg, mesh)(xs))
    A = dense_adj(s, r, n)
    for y in (y_plain, y_ov, y_ring):
        np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-5,
                                   atol=1e-5)


def test_bf16_halo_matches_fp32_within_rounding(rng):
    """halo_dtype=bf16 ships only boundary rows in bf16: the result must
    equal a dense oracle whose *halo contributions alone* are bf16-
    rounded (interior edges stay exact), and stay close to full fp32."""
    n, d = 64, 4
    s, r = make_random_graph(rng, n, 400)
    sg = build_sharded_graph(s, r, n, d)
    mesh = make_mesh(d)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    xs = shard_features(sg, x, mesh)
    y16 = unshard(sg, sharded_aggregate(sg, mesh,
                                        halo_dtype=jnp.bfloat16)(xs))
    A = dense_adj(s, r, n)
    want = A @ x
    np.testing.assert_allclose(np.asarray(y16), want, rtol=2e-2,
                               atol=2e-2)
    # exact check: recompute with senders' rows bf16-rounded iff the
    # edge crosses shards (matching which rows rode the wire)
    perm = np.asarray(sg.node_perm)        # old id -> shard-order row
    owner = perm // sg.n_loc_pad
    x_rounded = x.astype(jnp.bfloat16).astype(np.float32)
    y_exact = np.zeros_like(want)
    for si, ri_ in zip(s, r):
        row = x_rounded[si] if owner[si] != owner[ri_] else x[si]
        y_exact[ri_] += row
    np.testing.assert_allclose(np.asarray(y16), y_exact, rtol=1e-5,
                               atol=1e-5)


def test_projected_scaling_halo_itemsize():
    """bf16-on-the-wire halves the wire term and never lowers projected
    efficiency."""
    n, d = 1024, 8
    s, r = [], []
    for k in range(1, 4):
        idx = np.arange(n)
        s += [idx, (idx + k) % n]
        r += [(idx + k) % n, idx]
    s, r = np.concatenate(s), np.concatenate(r)
    sg = build_sharded_graph(s, r, n, d)
    p32 = sg.projected_scaling(t1_agg_s=1e-2, f=602)
    p16 = sg.projected_scaling(t1_agg_s=1e-2, f=602, halo_itemsize=2)
    assert p16["t_wire_s"] == pytest.approx(p32["t_wire_s"] / 2)
    assert p16["efficiency_overlap"] >= p32["efficiency_overlap"]


def test_ring_comm_volume_near_ideal_on_lattice():
    """VERDICT r1 #7 done-criterion: halo waste < 2x ideal on the
    lattice at D=8, and far below the all_to_all global-max layout."""
    n, d = 1024, 8
    s, r = [], []
    for k in range(1, 4):
        idx = np.arange(n)
        s += [idx, (idx + k) % n]
        r += [(idx + k) % n, idx]
    s, r = np.concatenate(s), np.concatenate(r)
    sg = build_sharded_graph(s, r, n, d)
    stats = sg.comm_stats(f=64)
    assert stats["ring_waste"] < 2.0, stats
    assert stats["ring_rows"] < stats["a2a_rows"], stats
    # correctness of the ring on this exact graph
    mesh = make_mesh(d)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    xs = shard_features(sg, x, mesh)
    y = unshard(sg, sharded_aggregate(sg, mesh)(xs))
    A = dense_adj(s, r, n)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-5, atol=1e-5)


def test_projected_scaling_report():
    """The scaling-efficiency projection (BASELINE.md >=80% north star)
    is internally consistent: overlap beats serial, a local lattice at
    D=8 projects high efficiency, and the wire term matches ring_pads."""
    n, d = 1024, 8
    s, r = [], []
    for k in range(1, 4):
        idx = np.arange(n)
        s += [idx, (idx + k) % n]
        r += [(idx + k) % n, idx]
    s, r = np.concatenate(s), np.concatenate(r)
    sg = build_sharded_graph(s, r, n, d)
    f = 256
    proj = sg.projected_scaling(t1_agg_s=10e-3, f=f)
    assert proj["n_devices"] == d
    assert proj["wire_rows_per_device"] == sum(sg.ring_pads)
    assert proj["wire_bytes_per_device"] == sum(sg.ring_pads) * f * 4
    assert 0 < proj["efficiency_serial"] <= proj["efficiency_overlap"] <= 1.0
    # local halos + balanced shards: the lattice should clear the 80%
    # north-star bar comfortably in projection
    assert proj["efficiency_overlap"] > 0.8, proj
    assert proj["speedup_overlap"] > d * 0.8
    # shrinking ICI bandwidth must not raise efficiency
    slow = sg.projected_scaling(t1_agg_s=10e-3, f=f,
                                ici_bytes_per_s=1e9)
    assert slow["efficiency_overlap"] <= proj["efficiency_overlap"]


def test_sharded_aggregate_interior_dedup_matches_dense(rng):
    """The interior-edge SpMM through the Pallas dedup kernel (interpret
    mode on CPU) must match the segment path bit-near; gradients flow
    through the transpose tiles (VERDICT r2 weak #1)."""
    from jax.experimental.pallas import tpu as pltpu

    n_nodes, n_edges, d = 300, 2500, 4
    s, r = make_random_graph(rng, n_nodes, n_edges)
    sg = build_sharded_graph(s, r, n_nodes, d, interior_tiles=True)
    assert sg.int_dedup is not None
    assert sg.int_dedup.w_blocks.shape[0] == d  # leading device axis
    mesh = make_mesh(d)
    x = rng.standard_normal((n_nodes, 8)).astype(np.float32)
    xs = shard_features(sg, x, mesh)
    A = dense_adj(s, r, n_nodes)
    with pltpu.force_tpu_interpret_mode():
        y = unshard(sg, sharded_aggregate(sg, mesh)(xs))
        np.testing.assert_allclose(np.asarray(y)[:, :], A @ x,
                                   rtol=1e-4, atol=1e-4)

        # gradient: d/dx sum(w * (A x)) = A^T w — via the transpose tiles
        w = rng.standard_normal((sg.total_rows, 8)).astype(np.float32)
        agg = sharded_aggregate(sg, mesh)

        def loss(xv):
            return jnp.sum(agg(xv) * w)

        gx = np.asarray(jax.grad(loss)(xs))
    w_orig = np.asarray(unshard(sg, w))
    want = A.T @ w_orig
    got = np.asarray(unshard(sg, jnp.asarray(gx)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_aggregate_interior_dedup_d1_degenerate(rng):
    """D=1: no halo, interior == all edges — the sharded path reduces
    to the flat kernel (the plumbing-parity case run on hardware)."""
    from jax.experimental.pallas import tpu as pltpu

    n_nodes, n_edges = 200, 1500
    s, r = make_random_graph(rng, n_nodes, n_edges)
    sg = build_sharded_graph(s, r, n_nodes, 1, interior_tiles=True)
    assert sg.int_dedup is not None
    mesh = make_mesh(1)
    x = rng.standard_normal((n_nodes, 8)).astype(np.float32)
    xs = shard_features(sg, x, mesh)
    with pltpu.force_tpu_interpret_mode():
        y = unshard(sg, sharded_aggregate(sg, mesh)(xs))
    A = dense_adj(s, r, n_nodes)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-4, atol=1e-4)


def test_sharded_sage_step_with_interior_tiles(rng):
    """Full sharded train step with the kernel interior path: loss
    finite and params update (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from gist_tpu.models import sage
    from gist_tpu.parallel.train import build_sharded_sage_step

    n_nodes, n_edges, d = 256, 2000, 4
    s, r = make_random_graph(rng, n_nodes, n_edges)
    sg = build_sharded_graph(s, r, n_nodes, d, interior_tiles=True)
    mesh = make_mesh(d)
    x = rng.standard_normal((n_nodes, 6)).astype(np.float32)
    xs = shard_features(sg, x, mesh)
    perm = np.asarray(sg.node_perm)
    lab = np.zeros(sg.total_rows, np.int32)
    lab[perm] = rng.integers(0, 3, n_nodes)
    msk = np.zeros(sg.total_rows, bool)
    msk[perm] = True
    cfg = sage.SAGEConfig(6, 8, 3, n_layers=1)
    params = sage.init(jax.random.PRNGKey(0), cfg)
    init_opt, step = build_sharded_sage_step(sg, mesh, lr=1e-2,
                                             weight_decay=0.0)
    with pltpu.force_tpu_interpret_mode():
        p2, _, loss = step(params, init_opt(params), xs,
                           jnp.asarray(lab), jnp.asarray(msk))
    assert np.isfinite(float(loss))
    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                        params, p2)
    assert max(jax.tree.leaves(diff)) > 0
