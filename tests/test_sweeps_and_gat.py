"""Sweep runner + GAT distributed-IST cluster training on the CPU mesh."""

import json

import pytest
import os

import numpy as np

from gist_tpu.data import synthetic_dataset
from gist_tpu.sweeps.runner import SweepRunner, grid, summarize


def test_grid():
    configs = list(grid(a=[1, 2], b=["x", "y"]))
    assert len(configs) == 4
    assert {"a": 1, "b": "x"} in configs


def test_sweep_runner_resume_and_errors(tmp_path):
    out = str(tmp_path / "sweep.jsonl")
    calls = []

    def fn(a, trial=0):
        calls.append((a, trial))
        if a == 2:
            raise RuntimeError("boom")
        return {"best_test": a * 0.1}

    runner = SweepRunner(fn, out, trials=2)
    recs = runner.run([{"a": 1}, {"a": 2}], verbose=False)
    assert len(recs) == 4
    statuses = [r["status"] for r in recs]
    assert statuses.count("ok") == 2 and statuses.count("error") == 2

    # resume: successes are skipped, errors retry
    runner2 = SweepRunner(fn, out, trials=2)
    recs2 = runner2.run([{"a": 1}, {"a": 2}], verbose=False)
    assert len(recs2) == 2
    assert all(r["config"] == {"a": 2} for r in recs2)

    rows = summarize(out)
    assert rows[0]["config"] == {"a": 1}
    assert rows[0]["n"] == 2


def test_sweep_configs_registered():
    from gist_tpu.sweeps.configs import SWEEPS
    assert {"small-baseline", "small-ist", "reddit-baseline", "reddit-ist",
            "amazon-ultrawide", "reddit-gat"} <= set(SWEEPS)
    # grids enumerate
    n = len(list(SWEEPS["reddit-ist"]()))
    assert n == 3 * 3 * 5


def test_gat_ist_cluster_training_smoke():
    from gist_tpu.models import gat
    from gist_tpu.train.common import TrainConfig
    from gist_tpu.train.ist_cluster import train_ist_cluster

    ds = synthetic_dataset("synth-tiny")
    cfg = gat.GATConfig(ds.in_feats, 8, ds.n_classes, n_layers=2, n_heads=2)
    tc = TrainConfig(lr=1e-2, weight_decay=0.0, n_epochs=4, num_subnet=2,
                     iter_per_site=2)
    res = train_ist_cluster(ds, cfg, tc, psize=4, batch_size=2, model=gat,
                            kind="gat", verbose=False)
    assert np.isfinite(res["losses"]).all()
    assert res["best_val"] >= 0.15  # above-chance-ish on 4 classes


def test_sage_ist_cluster_training_smoke():
    from gist_tpu.models import sage
    from gist_tpu.train.common import TrainConfig
    from gist_tpu.train.ist_cluster import train_ist_cluster

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=8, num_subnet=2,
                     iter_per_site=2)
    res = train_ist_cluster(ds, cfg, tc, psize=4, batch_size=2,
                            verbose=False)
    assert res["best_val"] > 0.3, res


def test_lsgd_baseline_learns():
    """Local-SGD baseline: full models per worker, periodic averaging
    (the reference's missing cluster_gcn_lsgd_distrib.py)."""
    from gist_tpu.models import sage
    from gist_tpu.train.common import TrainConfig
    from gist_tpu.train.ist_cluster import train_ist_cluster

    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=8, num_subnet=2,
                     iter_per_site=2)
    res = train_ist_cluster(ds, cfg, tc, psize=8, batch_size=2, lsgd=True,
                            verbose=False)
    assert res["best_val"] > 0.3, res


@pytest.mark.parametrize("tile_mode", ["gather", "dedup"])
def test_gat_pallas_through_stacked_scan(rng, tile_mode):
    """The composition the GAT auto-compose enables on TPU: stacked
    tiled cluster batches scanned through gat.apply with the fused
    kernel (interpret mode), forward + grad — de-risks the round-path
    semantics before any chip time.  Covers both tile layouts (dedup =
    the round-4 multi-head batched kernel)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.models import gat
    from gist_tpu.sampler import ClusterSampler
    from gist_tpu.train.ist_cluster import _stack_batches

    ds = synthetic_dataset("synth-tiny")
    s = ClusterSampler(ds, psize=4, batch_size=2, tiles=True,
                       tile_mode=tile_mode)
    gen = s.iter_node_ids()
    batches = [s.make_batch(next(gen), node_pad=256, numpy=True,
                            ids_only=True) for _ in range(2)]
    stacked = _stack_batches(batches)
    tables = s.tables()
    cfg = gat.GATConfig(s.features.shape[1], 8, ds.n_classes, n_layers=2,
                        n_heads=2)
    params = gat.init(jax.random.PRNGKey(0), cfg)

    def round_loss(params, stacked, backend):
        def body(acc, batch):
            graph, feats, labels, mask = ClusterSampler.resolve_batch(
                batch, tables)
            logits = gat.apply(params, graph, feats, cfg, backend=backend)
            m = mask.astype(jnp.float32)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return acc + jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0), None

        total, _ = jax.lax.scan(body, 0.0, stacked)
        return total

    want, gwant = jax.value_and_grad(round_loss)(params, stacked,
                                                 "segment")
    with pltpu.force_tpu_interpret_mode():
        got, ggot = jax.value_and_grad(round_loss)(params, stacked,
                                                   "pallas")
    np.testing.assert_allclose(float(got), float(want), rtol=2e-2)
    for a, b in zip(jax.tree.leaves(ggot), jax.tree.leaves(gwant)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=0.02)
