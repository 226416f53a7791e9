"""Ultra-wide host-offloaded IST: numpy dispatch/merge parity with the
device implementation, plus an end-to-end cluster training smoke."""

import numpy as np
import jax
import jax.numpy as jnp

from gist_tpu.data import synthetic_dataset
from gist_tpu.ist import dispatch_all, merge, sample_boundaries, boundary_sizes
from gist_tpu.ist.ultrawide import (dispatch_host, merge_host,
                                    sample_boundaries_host)
from gist_tpu.models import sage, gat
from gist_tpu.train.common import TrainConfig


def test_host_dispatch_matches_device():
    in_f, hid, ncls, n_layers, K = 12, 8, 3, 2, 2
    cfg = sage.SAGEConfig(in_f, hid, ncls, n_layers=n_layers)
    full = sage.init(jax.random.PRNGKey(0), cfg)
    full_np = jax.tree.map(np.asarray, full)
    sizes = boundary_sizes(in_f, hid, n_layers, split_input=False,
                           split_output=True)
    bnds = sample_boundaries(jax.random.PRNGKey(1), sizes, K)
    bnds_np = [None if b is None else np.asarray(b) for b in bnds]

    dev = dispatch_all(full, bnds, K, kind="sage")
    host = dispatch_host(full_np, bnds_np, K, kind="sage")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, rtol=1e-7),
        dev, host)


def test_host_merge_matches_device():
    in_f, hid, ncls, n_layers, K = 12, 8, 3, 2, 2
    cfg = sage.SAGEConfig(in_f, hid, ncls, n_layers=n_layers)
    full = sage.init(jax.random.PRNGKey(0), cfg)
    full_np = jax.tree.map(lambda a: np.array(a, copy=True), full)
    sizes = boundary_sizes(in_f, hid, n_layers, split_input=False,
                           split_output=True)
    bnds = sample_boundaries(jax.random.PRNGKey(1), sizes, K)
    bnds_np = [None if b is None else np.asarray(b) for b in bnds]
    stacked = dispatch_all(full, bnds, K, kind="sage")
    bumped = jax.tree.map(lambda x: x + 0.5, stacked)
    bumped_np = jax.tree.map(np.asarray, bumped)

    dev = merge(full, bnds, bumped, K, kind="sage")
    host = merge_host(full_np, bnds_np, bumped_np, K, kind="sage")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6),
        dev, host)


def test_host_gat_roundtrip():
    cfg = gat.GATConfig(10, 8, 3, n_layers=3, n_heads=2)
    full = jax.tree.map(np.asarray, gat.init(jax.random.PRNGKey(0), cfg))
    K = 2
    rng = np.random.default_rng(0)
    sizes = [None, 8, 8, None][:cfg.n_layers + 1]
    bnds = sample_boundaries_host(rng, sizes, K)
    stacked = dispatch_host(full, bnds, K, kind="gat")
    full2 = jax.tree.map(lambda a: np.array(a, copy=True), full)
    merged = merge_host(full2, bnds, stacked, K, kind="gat")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        full, merged)


def test_ultrawide_training_smoke():
    from gist_tpu.train.ist_ultrawide import train_ist_ultrawide

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=8, num_subnet=2,
                     iter_per_site=2)
    res = train_ist_ultrawide(ds, cfg, tc, psize=4, batch_size=2,
                              eval_on_cpu=True, verbose=False)
    assert res["ultra_wide"]
    assert res["best_val"] > 0.3, res


def test_ultrawide_sequential_matches_mesh():
    """The single-device sequential path (K subnets one after another on
    one chip — how the ultra-wide headline runs on a 1-chip TPU host)
    must produce the SAME trained model as the K-device shard_map path:
    identical batch stream, identical per-subnet key folds, host merge
    is shared.  Compared via the full val curve."""
    from gist_tpu.train.ist_ultrawide import train_ist_ultrawide

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                          dropout=0.3)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=8, num_subnet=2,
                     iter_per_site=2)
    r_mesh = train_ist_ultrawide(ds, cfg, tc, psize=4, batch_size=2,
                                 sequential=False, verbose=False)
    ds2 = synthetic_dataset("synth-tiny")
    r_seq = train_ist_ultrawide(ds2, cfg, tc, psize=4, batch_size=2,
                                sequential=True, verbose=False)
    np.testing.assert_allclose(r_seq["val_accs"], r_mesh["val_accs"])
    np.testing.assert_allclose(r_seq["losses"], r_mesh["losses"],
                               rtol=1e-5)


def test_ultrawide_checkpoint_resume(tmp_path):
    from gist_tpu.train.ist_ultrawide import train_ist_ultrawide

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=8, num_subnet=2,
                     iter_per_site=2)
    ck = str(tmp_path / "uw")
    r1 = train_ist_ultrawide(ds, cfg, tc, psize=4, batch_size=2,
                             checkpoint_dir=ck, verbose=False)
    ds2 = synthetic_dataset("synth-tiny")
    r2 = train_ist_ultrawide(ds2, cfg, tc, psize=4, batch_size=2,
                             checkpoint_dir=ck, verbose=False)
    assert np.isfinite(r2["best_val"])


def test_ultrawide_sequential_resume_matches_uninterrupted(tmp_path):
    """The chip flagship runs sequentially under a timeout and relies
    on checkpoint+replay: a run interrupted halfway and resumed must
    reproduce the uninterrupted run's val curve EXACTLY (params from
    the checkpoint, partition/cluster randomness replayed, drop_key
    restored)."""
    from gist_tpu.train.ist_ultrawide import train_ist_ultrawide

    cfg_kw = dict(psize=4, batch_size=2, sequential=True, verbose=False)
    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.3)
    full_tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=8,
                          num_subnet=2, iter_per_site=2)
    r_full = train_ist_ultrawide(synthetic_dataset("synth-tiny"), cfg,
                                 full_tc, **cfg_kw)
    # interrupted: half the epoch budget, checkpointed, then resume
    # with the full budget from the same dir
    half_tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=4,
                          num_subnet=2, iter_per_site=2)
    ck = str(tmp_path / "uw_seq")
    train_ist_ultrawide(synthetic_dataset("synth-tiny"), cfg, half_tc,
                        checkpoint_dir=ck, **cfg_kw)
    r_res = train_ist_ultrawide(synthetic_dataset("synth-tiny"), cfg,
                                full_tc, checkpoint_dir=ck, **cfg_kw)
    n_tail = len(r_res["val_accs"])
    assert 0 < n_tail < len(r_full["val_accs"])
    np.testing.assert_allclose(r_res["val_accs"],
                               r_full["val_accs"][-n_tail:])


def test_apply_chunked_host_matches_apply():
    """The memory-bounded host eval forward (edge-chunked aggregation +
    node-chunked linears, fp16 storage) must match the jax apply
    (eval mode) to fp16-storage tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.models import sage

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 48, ds.n_classes, n_layers=3)
    params = sage.init(jax.random.PRNGKey(0), cfg)
    g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    want = np.asarray(sage.apply(params, g, jnp.asarray(ds.features), cfg))
    params_np = jax.tree.map(np.asarray, params)
    got = sage.apply_chunked_host(params_np, ds.senders, ds.receivers,
                                  ds.features, cfg,
                                  edge_chunk=37, node_chunk=50)
    # fp16 intermediate storage: compare argmax + loose values
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.98


def test_apply_chunked_host_torch_matches_numpy():
    """The torch CPU fast path (multithreaded sparse SpMM + GEMM) must
    agree with the numpy/scipy reference path — same math, different
    BLAS; both run fp32 compute with fp16 storage."""
    import os

    import jax
    import numpy as np
    import pytest

    pytest.importorskip("torch")
    from gist_tpu.data import synthetic_dataset
    from gist_tpu.models import sage

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 48, ds.n_classes, n_layers=3)
    params_np = jax.tree.map(np.asarray,
                             sage.init(jax.random.PRNGKey(0), cfg))
    env = dict(os.environ)
    try:
        os.environ["GIST_EVAL_BACKEND"] = "numpy"
        ref = sage.apply_chunked_host(params_np, ds.senders, ds.receivers,
                                      ds.features, cfg)
        os.environ["GIST_EVAL_BACKEND"] = "torch"
        got = sage.apply_chunked_host(params_np, ds.senders, ds.receivers,
                                      ds.features, cfg)
    finally:
        os.environ.clear()
        os.environ.update(env)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.99
