"""Deterministic synthetic graph datasets (stochastic block model).

Shape statistics mirror the reference's real datasets so benchmarks and
tests exercise realistic sparsity/width regimes without network access:
cora (2708 nodes / ~10k edges / 1433 feats / 7 classes), reddit (233k
nodes / 115M edges — scaled-down variants provided), amazon2m, etc.
Features are class-correlated Gaussians so models actually learn —
accuracy climbing above chance is a meaningful training signal.
"""

from __future__ import annotations

import zlib

import numpy as np

from gist_tpu.data.container import Dataset

# name -> (n_nodes, avg_degree, n_feats, n_classes, n_train, n_val, n_test)
SYNTH_SPECS = {
    "synth-cora":     (2708, 4, 1432, 7, 140, 500, 1000),
    "synth-citeseer": (3327, 3, 3702, 6, 120, 500, 1000),
    "synth-pubmed":   (19717, 3, 500, 3, 60, 500, 1000),
    "synth-reddit-small": (23000, 50, 602, 41, 15000, 4000, 4000),
    "synth-reddit":   (232965, 100, 602, 41, 153431, 23831, 55703),
    "synth-amazon2m-small": (120000, 25, 100, 47, 100000, 10000, 10000),
    "synth-amazon2m": (2449029, 25, 100, 47, 1709124, 739905, 0),
    "synth-tiny":     (256, 4, 32, 4, 64, 64, 64),
}


def synthetic_dataset(name: str, seed: int = 0) -> Dataset:
    if name not in SYNTH_SPECS:
        raise KeyError(f"unknown synthetic dataset {name!r}; "
                       f"known: {sorted(SYNTH_SPECS)}")
    n, avg_deg, n_feats, n_classes, n_train, n_val, n_test = SYNTH_SPECS[name]
    # zlib.crc32 is stable across processes (Python's str hash is salted
    # per interpreter, which made "deterministic" datasets vary by run).
    rng = np.random.default_rng(seed ^ (zlib.crc32(name.encode()) & 0xFFFF))

    labels = rng.integers(0, n_classes, size=n).astype(np.int32)

    # SBM-ish edges: each node draws avg_deg neighbors, 70% same-class
    # (gives graph structure information beyond the features).
    deg = np.maximum(rng.poisson(avg_deg, size=n), 1)
    e_src = np.repeat(np.arange(n, dtype=np.int64), deg)
    n_e = e_src.shape[0]
    same = rng.random(n_e) < 0.7
    # same-class targets: random node of the same label via per-class pools
    order = np.argsort(labels, kind="stable")
    class_starts = np.searchsorted(labels[order], np.arange(n_classes))
    class_ends = np.searchsorted(labels[order], np.arange(n_classes), "right")
    src_lbl = labels[e_src]
    lo, hi = class_starts[src_lbl], class_ends[src_lbl]
    same_tgt = order[(lo + (rng.random(n_e) * (hi - lo)).astype(np.int64))]
    rand_tgt = rng.integers(0, n, size=n_e)
    e_dst = np.where(same, same_tgt, rand_tgt)

    # symmetrize + self loops (matching reference preprocessing)
    senders = np.concatenate([e_src, e_dst, np.arange(n, dtype=np.int64)])
    receivers = np.concatenate([e_dst, e_src, np.arange(n, dtype=np.int64)])

    # class-correlated sparse-ish features
    centers = rng.standard_normal((n_classes, n_feats)).astype(np.float32)
    feats = (0.5 * centers[labels]
             + rng.standard_normal((n, n_feats)).astype(np.float32))
    # sparsify like bag-of-words inputs (cora features are 0/1 sparse)
    mask = rng.random((n, n_feats)) < min(1.0, 50.0 / n_feats)
    feats = np.where(mask, feats, 0.0).astype(np.float32)

    perm = rng.permutation(n)
    train_mask = np.zeros(n, bool)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    train_mask[perm[:n_train]] = True
    val_mask[perm[n_train:n_train + n_val]] = True
    if n_test > 0:
        test_mask[perm[n_train + n_val:n_train + n_val + n_test]] = True
    else:
        test_mask[perm[n_train + n_val:]] = True

    return Dataset(
        name=name, senders=senders, receivers=receivers, features=feats,
        labels=labels, train_mask=train_mask, val_mask=val_mask,
        test_mask=test_mask, n_classes=n_classes)
