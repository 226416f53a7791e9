"""Synthetic datasets + dataset utilities."""

import numpy as np
import pytest

from gist_tpu.data import Dataset, load_dataset, synthetic_dataset


def test_synthetic_deterministic():
    a = synthetic_dataset("synth-tiny", seed=0)
    b = synthetic_dataset("synth-tiny", seed=0)
    np.testing.assert_array_equal(a.features, b.features)
    np.testing.assert_array_equal(a.senders, b.senders)
    c = synthetic_dataset("synth-tiny", seed=1)
    assert not np.array_equal(a.senders, c.senders)


def test_synthetic_deterministic_across_processes():
    """The dataset bytes must not depend on the interpreter (Python's
    str hash is process-salted; we use crc32 instead)."""
    import subprocess
    import sys

    code = ("import hashlib; from gist_tpu.data import synthetic_dataset; "
            "d = synthetic_dataset('synth-tiny', seed=0); "
            "h = hashlib.sha256(); h.update(d.features.tobytes()); "
            "h.update(d.senders.tobytes()); h.update(d.labels.tobytes()); "
            "print(h.hexdigest())")
    digests = set()
    for _ in range(2):
        out = subprocess.run([sys.executable, "-c", code], check=True,
                             capture_output=True, text=True, cwd="/root/repo")
        digests.add(out.stdout.strip().splitlines()[-1])
    assert len(digests) == 1, digests


def test_micro_f1_multitask():
    from gist_tpu.models.common import micro_f1
    logits = np.array([[1.0, -1.0, 2.0], [-1.0, 3.0, -2.0]])
    labels = np.array([[1, 0, 0], [0, 1, 1]])
    mask = np.ones(2, bool)
    # preds: [1,0,1], [0,1,0]; TP=2 (cells 0,4), FP=1 (cell 2), FN=1 (cell 5)
    assert micro_f1(logits, labels, mask, multitask=True) == \
        pytest.approx(2 * 2 / (2 * 2 + 1 + 1))
    # single-label path unchanged
    sl_labels = np.array([2, 1])
    assert micro_f1(logits, sl_labels, mask) == 1.0


def test_synthetic_masks_disjoint():
    ds = synthetic_dataset("synth-cora")
    assert ds.n_nodes == 2708 and ds.n_classes == 7
    overlap = (ds.train_mask & ds.val_mask) | (ds.train_mask & ds.test_mask) \
        | (ds.val_mask & ds.test_mask)
    assert not overlap.any()
    assert ds.train_mask.sum() == 140


def test_normalize_features():
    ds = synthetic_dataset("synth-tiny")
    ds.normalize_features()
    train = ds.features[ds.train_mask]
    np.testing.assert_allclose(train.mean(axis=0), 0.0, atol=1e-4)


def test_random_projection():
    ds = synthetic_dataset("synth-tiny")
    ds.random_projection(24)
    assert ds.features.shape == (ds.n_nodes, 24)


def test_load_dataset_dispatch():
    ds = load_dataset("synth-tiny")
    assert isinstance(ds, Dataset)
    with pytest.raises(KeyError):
        load_dataset("nope")
    with pytest.raises(FileNotFoundError):
        load_dataset("cora", root="/nonexistent")


def test_multihost_noop_single_host():
    from gist_tpu.multihost import init_multihost
    # no cluster env, no explicit coordinator -> no-op
    assert init_multihost() is False
