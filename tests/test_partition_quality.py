"""Partition quality: the multilevel refined partitioner must beat BFS
graph-growing on edge-cut (the property that drives Cluster-GCN accuracy
and the SpMM dedup factor).  Reference quality bar: METIS via
dgl.metis_partition (cluster_gcn/partition_utils.py:11-18)."""

import numpy as np
import pytest

from gist_tpu.data import synthetic_dataset


def _assignment(parts, n):
    a = np.full(n, -1, np.int64)
    for pid, p in enumerate(parts):
        a[p] = pid
    assert (a >= 0).all()
    return a


def _cut_fraction(senders, receivers, assign):
    s = np.asarray(senders)
    r = np.asarray(receivers)
    return float((assign[s] != assign[r]).mean())


@pytest.fixture(scope="module")
def reddit_small():
    ds = synthetic_dataset("synth-reddit-small")
    return ds


def test_refined_beats_bfs_cut(reddit_small):
    from gist_tpu.partition.native import (native_partition,
                                           native_refined_partition)
    ds = reddit_small
    psize = 180
    bfs = native_partition(ds.senders, ds.receivers, ds.n_nodes, psize)
    ref = native_refined_partition(ds.senders, ds.receivers, ds.n_nodes,
                                   psize)
    cut_b = _cut_fraction(ds.senders, ds.receivers,
                          _assignment(bfs, ds.n_nodes))
    cut_r = _cut_fraction(ds.senders, ds.receivers,
                          _assignment(ref, ds.n_nodes))
    # measured: 0.896 vs 0.620 (31% reduction); assert with margin
    assert cut_r < 0.8 * cut_b, (cut_r, cut_b)


def test_refined_no_empty_parts(reddit_small):
    from gist_tpu.partition.native import native_refined_partition
    ds = reddit_small
    for psize in (64, 180):
        parts = native_refined_partition(ds.senders, ds.receivers,
                                         ds.n_nodes, psize)
        sizes = np.array([len(p) for p in parts])
        assert (sizes > 0).all(), sizes.min()
        # coverage + disjointness
        _assignment(parts, ds.n_nodes)
        assert sizes.sum() == ds.n_nodes


def test_numpy_refine_fallback_improves_cut():
    from gist_tpu.partition.greedy import greedy_partition, refine_partition
    ds = synthetic_dataset("synth-tiny")
    psize = 4
    base = greedy_partition(ds.senders, ds.receivers, ds.n_nodes, psize)
    ref = refine_partition(ds.senders, ds.receivers, ds.n_nodes, base)
    cut_b = _cut_fraction(ds.senders, ds.receivers,
                          _assignment(base, ds.n_nodes))
    cut_r = _cut_fraction(ds.senders, ds.receivers,
                          _assignment(ref, ds.n_nodes))
    assert cut_r <= cut_b
    sizes = np.array([len(p) for p in ref])
    assert sizes.sum() == ds.n_nodes


def test_refined_deterministic(reddit_small):
    from gist_tpu.partition.native import native_refined_partition
    ds = reddit_small
    a = native_refined_partition(ds.senders, ds.receivers, ds.n_nodes, 32,
                                 seed=7)
    b = native_refined_partition(ds.senders, ds.receivers, ds.n_nodes, 32,
                                 seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_dedup_factor_improves_with_refined_ordering(reddit_small):
    """The locality ordering is what buys the SpMM kernel its HBM
    saving: per-tile unique-sender fraction must drop well below the
    natural-order value."""
    from gist_tpu.graph import _locality_order
    ds = reddit_small
    TN = 128
    s = np.asarray(ds.senders)
    r = np.asarray(ds.receivers)

    def dedup(s, r, n):
        order = np.argsort(r, kind="stable")
        ss, rr = s[order], r[order]
        counts = np.bincount(rr, minlength=n)
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=indptr[1:])
        uniq = 0
        for i in range(-(-n // TN)):
            a, b = indptr[min(i * TN, n)], indptr[min((i + 1) * TN, n)]
            uniq += len(np.unique(ss[a:b]))
        return uniq / len(s)

    d_nat = dedup(s, r, ds.n_nodes)
    _, pos = _locality_order(s, r, ds.n_nodes, TN)
    d_ref = dedup(pos[s], pos[r], ds.n_nodes)
    assert d_ref < d_nat - 0.15, (d_ref, d_nat)
