"""End-to-end training smoke + learning tests on tiny synthetic data."""

import numpy as np
import jax

from gist_tpu.data import synthetic_dataset
from gist_tpu.ist.simulate import train_ist_simulation
from gist_tpu.models import gcn, sage
from gist_tpu.train.common import TrainConfig, reference_lr_schedule
from gist_tpu.train.full_graph import train_full_graph


def test_full_graph_gcn_learns():
    ds = synthetic_dataset("synth-tiny")
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                        dropout=0.1)
    tc = TrainConfig(lr=1e-2, weight_decay=5e-4, n_epochs=30)
    res = train_full_graph(ds, cfg, tc, verbose=False)
    # must beat chance (4 classes -> 0.25) decisively
    assert res["best_val_acc"] > 0.5, res["best_val_acc"]
    assert res["losses"][-1] < res["losses"][0]


def test_ist_simulation_learns_and_matches_protocol():
    ds = synthetic_dataset("synth-tiny")
    # width divisible by num_subnet (train_ist.py:62)
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        dropout=0.0)
    tc = TrainConfig(lr=1e-2, weight_decay=5e-4, n_epochs=24,
                     num_subnet=2, iter_per_site=4, split_input=True,
                     split_output=True)
    res = train_ist_simulation(ds, cfg, tc, verbose=False)
    assert res["best_val_acc"] > 0.4, res["best_val_acc"]
    assert len(res["val_accs"]) == 24


def test_ist_single_subnet_reduces_to_full_model():
    """K=1 IST with iter_per_site=1 must behave like plain training
    (dispatch/merge are identities)."""
    ds = synthetic_dataset("synth-tiny")
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                        dropout=0.0)
    tc = TrainConfig(lr=1e-2, weight_decay=0.0, n_epochs=8, num_subnet=1,
                     iter_per_site=1)
    res_ist = train_ist_simulation(ds, cfg, tc, verbose=False)
    res_full = train_full_graph(ds, cfg, tc, verbose=False)
    # Same seeds, same math — K=1 merge averages a single copy.
    # Optimizer state resets every epoch for IST (fresh Adam per
    # dispatch), so trajectories differ; both must learn.
    assert res_ist["best_val_acc"] > 0.4
    assert res_full["best_val_acc"] > 0.4


def test_reference_lr_schedule():
    assert reference_lr_schedule(1.0, 100, 0) == 1.0
    assert reference_lr_schedule(1.0, 100, 49) == 1.0
    assert reference_lr_schedule(1.0, 100, 50) == 0.1
    assert np.isclose(reference_lr_schedule(1.0, 100, 75), 0.01)


def test_scanned_trainer_matches_loop():
    """scan_epochs path == per-epoch loop (same seeds, no dropout)."""
    ds = synthetic_dataset("synth-tiny")
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                        dropout=0.0)
    tc = TrainConfig(lr=1e-2, weight_decay=5e-4, n_epochs=10,
                     lr_schedule=True)
    r_loop = train_full_graph(ds, cfg, tc, verbose=False)
    r_scan = train_full_graph(ds, cfg, tc, scan_epochs=4, verbose=False)
    np.testing.assert_allclose(r_scan["losses"], r_loop["losses"],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(r_scan["val_accs"], r_loop["val_accs"],
                               atol=1e-6)


def test_fused_ist_learns():
    ds = synthetic_dataset("synth-tiny")
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        dropout=0.0)
    tc = TrainConfig(lr=1e-2, weight_decay=5e-4, n_epochs=24,
                     num_subnet=2, iter_per_site=4, split_input=True,
                     split_output=True)
    res = train_ist_simulation(ds, cfg, tc, fused=True, verbose=False)
    assert res["fused"] and res["best_val_acc"] > 0.4, res
    assert len(res["val_accs"]) == 6  # one eval per round


def test_ist_simulation_sage_kind():
    """IST simulation over the SAGE stack (kind='sage' slicing)."""
    from gist_tpu.models import sage
    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=12, num_subnet=2,
                     iter_per_site=3, split_output=True)
    res = train_ist_simulation(ds, cfg, tc, model=sage, kind="sage",
                               fused=True, verbose=False)
    assert res["best_val_acc"] > 0.4, res
