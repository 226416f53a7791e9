"""Execute every on-disk loader branch against fabricated fixture files
in each real format (VERDICT r1 'Missing #3': ~230 LoC of format parsing
had never parsed a file).  Format specs: planetoid ``ind.*`` pickles,
DGL reddit npz pair, GraphSAGE json/npy (AmazonDataset.py:18-188,
utils.py:83-124)."""

import json
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from gist_tpu.data import load_dataset


# ---------------------------------------------------------------------------
# planetoid
# ---------------------------------------------------------------------------

def _write_planetoid(root, name="cora", n_train=20, n_val=500, n_test=30,
                     f=8, c=3, seed=0, gaps=0):
    """``gaps > 0`` fabricates the citeseer quirk: test ids span
    ``n_test + gaps`` positions with ``gaps`` isolated holes, so the
    loader must zero-extend tx/ty before the vstack."""
    rng = np.random.default_rng(seed)
    n_allx = n_train + n_val
    span = n_test + gaps
    n = n_allx + span

    def feats(k):
        return sp.csr_matrix(rng.random((k, f)).astype(np.float32))

    def onehot(k):
        y = np.zeros((k, c), np.int64)
        y[np.arange(k), rng.integers(0, c, k)] = 1
        return y

    allx, tx = feats(n_allx), feats(n_test)
    ally, ty = onehot(n_allx), onehot(n_test)
    x, y = allx[:n_train], ally[:n_train]
    graph = {}
    for u in range(n):
        graph[u] = list(rng.integers(0, n, 3))
    if gaps:
        # first and last span positions present (span is exact)
        mid = rng.choice(np.arange(1, span - 1), n_test - 2, replace=False)
        positions = np.concatenate([[0], np.sort(mid), [span - 1]])
        test_idx = rng.permutation(n_allx + positions)
    else:
        test_idx = rng.permutation(np.arange(n_allx, n))

    objs = {"x": x, "y": y, "tx": tx, "ty": ty, "allx": allx, "ally": ally,
            "graph": graph}
    for k, v in objs.items():
        with open(os.path.join(root, f"ind.{name}.{k}"), "wb") as fh:
            pickle.dump(v, fh)
    np.savetxt(os.path.join(root, f"ind.{name}.test.index"), test_idx,
               fmt="%d")
    return n, f, c, n_train, n_val, n_test, test_idx


def test_load_planetoid_fixture(tmp_path):
    n, f, c, n_train, n_val, n_test, test_idx = _write_planetoid(
        str(tmp_path))
    ds = load_dataset("cora", root=str(tmp_path))
    assert ds.features.shape == (n, f)
    assert ds.labels.shape == (n,) and ds.labels.max() < c
    assert ds.n_classes == c
    assert ds.train_mask.sum() == n_train
    assert ds.val_mask.sum() == n_val
    assert ds.test_mask.sum() == n_test
    assert ds.test_mask[np.sort(test_idx)].all()
    # masks disjoint
    assert not (ds.train_mask & ds.val_mask).any()
    assert not (ds.train_mask & ds.test_mask).any()
    assert len(ds.senders) == len(ds.receivers) > 0
    assert ds.senders.max() < n and ds.receivers.max() < n


def test_load_planetoid_shuffled_test_index_reorders_rows(tmp_path):
    """The loader must place tx rows at their (non-contiguous) test ids —
    the citeseer quirk (features[test_idx] = features[test_range])."""
    n, f, c, *_ , test_idx = _write_planetoid(str(tmp_path), seed=3)
    ds = load_dataset("cora", root=str(tmp_path))
    with open(tmp_path / "ind.cora.tx", "rb") as fh:
        tx = pickle.load(fh).todense()
    # planetoid semantics: tx row k belongs to node test_idx[k] (file
    # order); the loader's features[test_idx] = features[test_range]
    # performs that placement
    np.testing.assert_allclose(ds.features[test_idx], np.asarray(tx),
                               rtol=1e-6)


def test_load_planetoid_gapped_test_index_citeseer_quirk(tmp_path):
    """citeseer has isolated test nodes: test.index is non-contiguous,
    and tx/ty must be zero-extended over [min, max] before the vstack
    (the loader previously indexed out of bounds here)."""
    n, f, c, n_train, n_val, n_test, test_idx = _write_planetoid(
        str(tmp_path), name="citeseer", seed=7, gaps=9)
    ds = load_dataset("citeseer", root=str(tmp_path))
    assert ds.features.shape == (n, f)
    assert ds.test_mask.sum() == n_test
    with open(tmp_path / "ind.citeseer.tx", "rb") as fh:
        tx = np.asarray(pickle.load(fh).todense())
    # tx row k belongs to node test_idx[k] (file order)
    np.testing.assert_allclose(ds.features[test_idx], tx, rtol=1e-6)
    # isolated (gap) nodes: zero features, no mask membership
    gap_ids = np.setdiff1d(
        np.arange(n_train + n_val, n), np.sort(test_idx))
    assert len(gap_ids) == 9
    np.testing.assert_array_equal(ds.features[gap_ids], 0.0)
    assert not ds.test_mask[gap_ids].any()
    assert not ds.train_mask[gap_ids].any()


# ---------------------------------------------------------------------------
# reddit
# ---------------------------------------------------------------------------

def _write_reddit(root, n=60, f=10, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.random((n, f)).astype(np.float32)
    labels = rng.integers(0, 41, n).astype(np.int64)
    node_types = rng.choice([1, 2, 3], size=n, p=[0.6, 0.2, 0.2])
    np.savez(os.path.join(root, "reddit_data.npz"), feature=feats,
             label=labels, node_types=node_types)
    adj = sp.random(n, n, density=0.05, format="coo", random_state=1)
    sp.save_npz(os.path.join(root, "reddit_graph.npz"), adj.tocsr())
    return feats, labels, node_types


def test_load_reddit_fixture(tmp_path):
    feats, labels, node_types = _write_reddit(str(tmp_path))
    ds = load_dataset("reddit", root=str(tmp_path))
    np.testing.assert_array_equal(ds.features, feats)
    np.testing.assert_array_equal(ds.labels, labels)
    np.testing.assert_array_equal(ds.train_mask, node_types == 1)
    np.testing.assert_array_equal(ds.val_mask, node_types == 2)
    assert ds.n_classes == 41

    # self-loop variant: every node gets exactly one self edge
    ds2 = load_dataset("reddit-self-loop", root=str(tmp_path))
    loops = ds2.senders == ds2.receivers
    assert loops.sum() == feats.shape[0]


# ---------------------------------------------------------------------------
# ppi
# ---------------------------------------------------------------------------

def _write_ppi(root, sizes=(30, 10, 12), f=6, c=5, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "ppi"), exist_ok=True)
    for split, n in zip(("train", "valid", "test"), sizes):
        base = os.path.join(root, "ppi", split)
        links = [{"source": int(rng.integers(0, n)),
                  "target": int(rng.integers(0, n))} for _ in range(3 * n)]
        with open(base + "_graph.json", "w") as fh:
            json.dump({"links": links}, fh)
        np.save(base + "_feats.npy", rng.random((n, f)).astype(np.float32))
        labels = (rng.random((n, c)) < 0.3).astype(np.int64)
        np.save(base + "_labels.npy", labels)
    return sizes, f, c


def test_load_ppi_fixture(tmp_path):
    (n_tr, n_va, n_te), f, c = _write_ppi(str(tmp_path))
    ds = load_dataset("ppi", root=str(tmp_path))
    n = n_tr + n_va + n_te
    assert ds.features.shape == (n, f)
    # ppi is multitask: full multi-hot matrix kept, n_classes = C
    assert ds.labels_multi is not None
    assert ds.labels_multi.shape == (n, c)
    assert ds.n_classes == c
    assert ds.multitask
    assert ds.train_mask.sum() == n_tr
    assert ds.val_mask.sum() == n_va
    assert ds.test_mask.sum() == n_te
    # split graphs are disjoint: no edge crosses a split boundary
    b1, b2 = n_tr, n_tr + n_va
    seg = np.digitize(ds.senders, [b1, b2])
    seg_r = np.digitize(ds.receivers, [b1, b2])
    assert (seg == seg_r).all()


# ---------------------------------------------------------------------------
# amazon2m
# ---------------------------------------------------------------------------

def _write_amazon(root, n=40, f=8, c=4, seed=0, prefix="amazon2M"):
    rng = np.random.default_rng(seed)
    feats = rng.random((n, f)).astype(np.float32)
    np.save(os.path.join(root, f"{prefix}-feats.npy"), feats)
    id_map = {str(i): i for i in range(n)}
    class_map = {str(i): int(rng.integers(0, c)) for i in range(n)}
    nodes = []
    for i in range(n):
        nd = {"id": i}
        if i % 5 == 0:
            nd["test"] = True
        elif i % 5 == 1:
            nd["val"] = True
        nodes.append(nd)
    links = [{"source": int(rng.integers(0, n)),
              "target": int(rng.integers(0, n))} for _ in range(4 * n)]
    with open(os.path.join(root, f"{prefix}-G.json"), "w") as fh:
        json.dump({"nodes": nodes, "links": links}, fh)
    with open(os.path.join(root, f"{prefix}-id_map.json"), "w") as fh:
        json.dump(id_map, fh)
    with open(os.path.join(root, f"{prefix}-class_map.json"), "w") as fh:
        json.dump(class_map, fh)
    return feats, class_map, links


def test_load_amazon2m_fixture_and_cache(tmp_path):
    feats, class_map, links = _write_amazon(str(tmp_path))
    n = feats.shape[0]
    ds = load_dataset("amazon2m", root=str(tmp_path))
    assert ds.features.shape == feats.shape
    # edges symmetrized: every link appears in both directions
    assert len(ds.senders) == 2 * len(links)
    for i in range(n):
        assert ds.labels[i] == class_map[str(i)]
    # masks: i%5==0 test, ==1 val, rest train
    assert ds.test_mask[0] and ds.val_mask[1] and ds.train_mask[2]
    assert (ds.train_mask.sum() + ds.val_mask.sum() + ds.test_mask.sum()
            == n)
    # train features standardized in-place
    mu = ds.features[ds.train_mask].mean(axis=0)
    np.testing.assert_allclose(mu, 0.0, atol=1e-4)

    # second load comes from the processed cache and matches
    assert os.path.exists(tmp_path / "amazon2M-processed.npz")
    ds2 = load_dataset("amazon2m", root=str(tmp_path))
    np.testing.assert_array_equal(ds.features, ds2.features)
    np.testing.assert_array_equal(ds.senders, ds2.senders)
    np.testing.assert_array_equal(ds.labels, ds2.labels)


def test_missing_files_raise(tmp_path):
    for name in ("cora", "reddit", "amazon2m", "ppi"):
        with pytest.raises(FileNotFoundError):
            load_dataset(name, root=str(tmp_path / "nope"))
