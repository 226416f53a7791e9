"""Cluster sampler + partitioner + cluster-GCN training smoke."""

import numpy as np
import pytest

from gist_tpu.data import synthetic_dataset
from gist_tpu.partition import get_partition_list
from gist_tpu.partition.greedy import greedy_partition
from gist_tpu.sampler import ClusterSampler, bucket_size


def test_bucket_size_monotone():
    assert bucket_size(10) == 256
    assert bucket_size(256) == 256
    sizes = [bucket_size(n) for n in range(1, 5000, 37)]
    assert all(b >= n for n, b in zip(range(1, 5000, 37), sizes))
    assert len(set(sizes)) < 25  # few distinct buckets -> few recompiles


def test_greedy_partition_cover():
    ds = synthetic_dataset("synth-tiny")
    parts = greedy_partition(ds.senders, ds.receivers, ds.n_nodes, 8, seed=1)
    allids = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(allids, np.arange(ds.n_nodes))


def test_sampler_tiles_bucketed_and_correct():
    """tiles=True batches carry bucket-padded dedup layouts whose kernel
    output matches the segment backend."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from gist_tpu.ops.spmm import spmm_segment
    from gist_tpu.ops.pallas_spmm import spmm_pallas_csr
    from gist_tpu.sampler import bucket_size

    ds = synthetic_dataset("synth-tiny")
    sampler = ClusterSampler(ds, psize=4, batch_size=2, tiles=True)
    batches = list(sampler)
    shapes = set()
    for b in batches:
        g = b.graph
        assert g.dedup is not None and g.dedup_t is not None
        j = int(g.dedup.w_blocks.shape[0])
        assert j == bucket_size(j, sampler.bucket_growth, 8) or \
            j >= int(g.dedup.job_offsets[-1])
        shapes.add((g.dedup.w_blocks.shape, g.dedup.max_jobs))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (g.n_nodes, 8)).astype(np.float32))
        want = np.asarray(spmm_segment(g, x))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(spmm_pallas_csr(g, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # same node/edge buckets -> shared tile shapes (jit cache hits)
    assert len(shapes) <= len(batches)


def test_partition_cache(tmp_path):
    ds = synthetic_dataset("synth-tiny")
    p1 = get_partition_list(ds.senders, ds.receivers, ds.n_nodes, 4,
                            cache_dir=str(tmp_path), name="t")
    assert (tmp_path / "t_4_refined.npy").exists()
    p2 = get_partition_list(ds.senders, ds.receivers, ds.n_nodes, 4,
                            cache_dir=str(tmp_path), name="t")
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_cluster_sampler_batches():
    ds = synthetic_dataset("synth-tiny")
    sampler = ClusterSampler(ds, psize=8, batch_size=2)
    batches = list(sampler)
    assert len(batches) == 4
    seen = 0
    for b in batches:
        assert b.features.shape[0] == b.graph.n_nodes  # padded consistently
        assert b.n_real_nodes <= b.graph.n_nodes
        # padding nodes masked out
        m = np.asarray(b.train_mask)
        assert not m[b.n_real_nodes:].any()
        seen += b.n_real_nodes
    # one epoch covers every train node exactly once
    assert seen == int(ds.train_mask.sum())
    # second epoch reshuffles
    batches2 = list(sampler)
    assert len(batches2) == 4


def test_cluster_sampler_use_pp():
    ds = synthetic_dataset("synth-tiny")
    s = ClusterSampler(ds, psize=4, batch_size=2, use_pp=True)
    assert s.features.shape[1] == 2 * ds.in_feats


def test_cluster_gcn_training_smoke():
    from gist_tpu.models import sage
    from gist_tpu.train.cluster import train_cluster_gcn
    from gist_tpu.train.common import TrainConfig

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.1)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=5)
    res = train_cluster_gcn(ds, cfg, tc, psize=4, batch_size=2,
                            verbose=False)
    assert res["best_val"] > 0.3, res
    assert res["train_time"] > 0


def test_cluster_gcn_scan_batches_matches_loop():
    from gist_tpu.models import sage
    from gist_tpu.train.cluster import train_cluster_gcn
    from gist_tpu.train.common import TrainConfig

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=4)
    r1 = train_cluster_gcn(ds, cfg, tc, psize=4, batch_size=2,
                           verbose=False)
    ds2 = synthetic_dataset("synth-tiny")
    r2 = train_cluster_gcn(ds2, cfg, tc, psize=4, batch_size=2,
                           scan_batches=True, verbose=False)
    # same learning signal (exact trajectories differ: the scan path
    # consumes dropout keys differently, but dropout=0 here and batch
    # order matches given identical seeds)
    assert r2["best_val"] > 0.3
    np.testing.assert_allclose(r1["losses"], r2["losses"], rtol=1e-4)


def test_unify_tile_buckets_stacks_mismatched_job_buckets():
    """Regression (ADVICE r2): two batches of one scanned round whose
    dedup job counts land in different geometric buckets must re-pad to
    a common bucket before jax.tree.map(stack)."""
    import numpy as np

    from gist_tpu.data.container import Dataset
    from gist_tpu.sampler import unify_tile_buckets
    from gist_tpu.train.ist_cluster import _stack_batches

    n = 1600
    base_s = np.arange(n, dtype=np.int64)
    base_r = (base_s + 1) % n
    ds = Dataset(name="t", senders=base_s, receivers=base_r,
                 features=np.random.default_rng(0).random(
                     (n, 4)).astype(np.float32),
                 labels=np.zeros(n, np.int32),
                 train_mask=np.ones(n, bool), val_mask=np.zeros(n, bool),
                 test_mask=np.zeros(n, bool), n_classes=2)
    s = ClusterSampler(ds, psize=4, batch_size=4, tiles=True)
    ids = np.arange(n, dtype=np.int64)
    # batch A: receivers confined to 2 dst tiles -> 2 jobs (bucket 8)
    r_a = np.repeat(np.arange(200, dtype=np.int64), 4)
    s_a = (r_a + 1) % 200
    # batch B: receivers over all 13 tiles -> 13 jobs (bucket 14)
    r_b = np.arange(n, dtype=np.int64)
    s_b = (r_b + 1) % n
    e_pad = 2048
    ba = s.make_batch(ids, node_pad=n, edge_pad=e_pad, edges=(s_a, r_a),
                      numpy=True, ids_only=True)
    bb = s.make_batch(ids, node_pad=n, edge_pad=e_pad, edges=(s_b, r_b),
                      numpy=True, ids_only=True)
    assert ba.graph.dedup is not None and bb.graph.dedup is not None
    assert (ba.graph.dedup.w_blocks.shape[0]
            != bb.graph.dedup.w_blocks.shape[0])  # the crash condition
    # _stack_batches unifies internally and must not raise
    stacked = _stack_batches([ba, bb])
    g = stacked[0]
    assert g.dedup.w_blocks.shape[0] == 2  # scan axis
    u = unify_tile_buckets([ba, bb])
    assert (u[0].graph.dedup.w_blocks.shape
            == u[1].graph.dedup.w_blocks.shape)
    assert u[0].graph.dedup.max_jobs == u[1].graph.dedup.max_jobs


def test_unify_tile_buckets_strips_mixed_none():
    """A round mixing tiled and tile-less batches (edge-count threshold)
    must fall back to tile-less uniformly."""
    import numpy as np

    ds = synthetic_dataset("synth-tiny")
    s = ClusterSampler(ds, psize=4, batch_size=2, tiles=True)
    ids = np.arange(s.n_nodes, dtype=np.int64)
    from gist_tpu.sampler import unify_tile_buckets
    b1 = s.make_batch(ids, numpy=True, ids_only=True)
    s.tiles = False
    b2 = s.make_batch(ids, numpy=True, ids_only=True)
    assert b1.graph.dedup is not None and b2.graph.dedup is None
    u = unify_tile_buckets([b1, b2])
    assert all(b.graph.dedup is None for b in u)


def test_multitask_cluster_training_smoke():
    """PPI-style multitask: 2-D float labels flow through the sampler,
    BCE loss, and threshold micro-F1 (ADVICE r2 low #3)."""
    import numpy as np

    from gist_tpu.models import sage
    from gist_tpu.train.cluster import train_cluster_gcn
    from gist_tpu.train.common import TrainConfig

    ds = synthetic_dataset("synth-tiny")
    rng = np.random.default_rng(1)
    c = 5
    # learnable multitask labels: threshold a random projection
    w = rng.standard_normal((ds.in_feats, c)).astype(np.float32)
    ds.labels_multi = (ds.features @ w > 0).astype(np.float32)
    ds.labels = ds.labels_multi.argmax(axis=1).astype(np.int32)
    ds.n_classes = c
    cfg = sage.SAGEConfig(ds.in_feats, 16, c, n_layers=1, dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=6)
    res = train_cluster_gcn(ds, cfg, tc, psize=4, batch_size=2,
                            use_f1=True, verbose=False)
    assert res["best_val"] > 0.5, res  # micro-F1, learnable labels
    res2 = train_cluster_gcn(ds, cfg, tc, psize=4, batch_size=2,
                             use_f1=True, scan_batches=True, verbose=False)
    assert res2["best_val"] > 0.5, res2


def test_sampler_gather_tile_mode_for_gat():
    """tile_mode='gather' builds the linked v1 TiledCSR pair (the fused
    GAT kernel's layout) with bucketed padding; rounds stack."""
    import numpy as np

    from gist_tpu.train.ist_cluster import _stack_batches

    ds = synthetic_dataset("synth-tiny")
    s = ClusterSampler(ds, psize=4, batch_size=2, tiles=True,
                       tile_mode="gather")
    gen = s.iter_node_ids()
    ids1, ids2 = next(gen), next(gen)
    b1 = s.make_batch(ids1, node_pad=256, numpy=True, ids_only=True)
    b2 = s.make_batch(ids2, node_pad=256, numpy=True, ids_only=True)
    for b in (b1, b2):
        assert b.graph.tiled is not None and b.graph.tiled_t is not None
        assert b.graph.tiled.pos_in_other is not None
        assert b.graph.dedup is None
        assert b.graph.tiled.senders.shape[0] % 1024 == 0
    # force an edge-slot bucket mismatch, then unify + stack
    from gist_tpu.graph import pad_tiled_csr
    b2 = b2.replace(graph=b2.graph.replace(
        tiled=pad_tiled_csr(b2.graph.tiled,
                            b2.graph.tiled.senders.shape[0] + 1024, 2,
                            as_numpy=True)))
    stacked = _stack_batches([b1, b2])
    assert stacked[0].tiled.senders.shape[0] == 2


def test_gat_apply_auto_backend_resolves_on_cpu():
    """backend=None resolves to segment off-TPU even when the graph
    carries gather tiles (auto must not hand CPU the Mosaic kernel)."""
    import jax
    import jax.numpy as jnp

    from gist_tpu.graph import graph_from_edges
    from gist_tpu.models import gat
    from gist_tpu.ops.spmm import resolve_gat_backend

    ds = synthetic_dataset("synth-tiny")
    g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes, tiles=True,
                         tile_mode="gather")
    assert g.tiled is not None
    assert resolve_gat_backend(g) == "segment"  # cpu test session
    cfg = gat.GATConfig(ds.in_feats, 8, ds.n_classes, n_layers=2,
                        n_heads=2)
    params = gat.init(jax.random.PRNGKey(0), cfg)
    out = gat.apply(params, g, jnp.asarray(ds.features), cfg)
    assert out.shape == (ds.n_nodes, ds.n_classes)

    # bf16 path returns fp32 logits close to the fp32 path
    cfg16 = gat.GATConfig(ds.in_feats, 8, ds.n_classes, n_layers=2,
                          n_heads=2, dtype="bfloat16")
    out16 = gat.apply(params, g, jnp.asarray(ds.features), cfg16)
    assert out16.dtype == jnp.float32
    import numpy as np
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out),
                               rtol=0.1, atol=0.15)
