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
