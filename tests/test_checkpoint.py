"""Checkpoint save/restore + resume-in-trainer + determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from gist_tpu.data import synthetic_dataset
from gist_tpu.models import sage
from gist_tpu.train.checkpoint import (latest_round_dir, load_checkpoint,
                                       save_checkpoint)
from gist_tpu.train.common import TrainConfig
from gist_tpu.train.ist_cluster import train_ist_cluster


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"layers": [{"w": jnp.ones((4, 3)),
                               "b": jnp.zeros((3,))}]},
        "round": 7,
        "part_key": np.asarray(jax.random.PRNGKey(1)),
    }
    path = str(tmp_path / "round_7")
    save_checkpoint(path, state)
    back = load_checkpoint(path)
    assert int(back["round"]) == 7
    np.testing.assert_array_equal(np.asarray(back["params"]["layers"][0]["w"]),
                                  np.ones((4, 3)))
    assert latest_round_dir(str(tmp_path)) == path


def test_trainer_checkpoints_and_resumes(tmp_path):
    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=8, num_subnet=2,
                     iter_per_site=2)
    ckdir = str(tmp_path / "ck")
    res1 = train_ist_cluster(ds, cfg, tc, psize=4, batch_size=2,
                             checkpoint_dir=ckdir, verbose=False)
    assert latest_round_dir(ckdir) is not None
    assert len(res1["eval_times"]) == len(res1["val_accs"])
    # resume: all rounds already done -> runs only the missing tail
    ds2 = synthetic_dataset("synth-tiny")
    res2 = train_ist_cluster(ds2, cfg, tc, psize=4, batch_size=2,
                             checkpoint_dir=ckdir, verbose=False)
    # resumed run still reports finite metrics
    assert np.isfinite(res2["best_val"])


def test_training_determinism():
    """Same seeds => identical loss trajectories (SURVEY §4: the
    reference's only reproducibility control, made a real test)."""
    ds = synthetic_dataset("synth-tiny")
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.2)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=4, num_subnet=2,
                     iter_per_site=2, seed=5, dropout_seed=6)
    r1 = train_ist_cluster(ds, cfg, tc, psize=4, batch_size=2,
                           verbose=False)
    ds2 = synthetic_dataset("synth-tiny")
    r2 = train_ist_cluster(ds2, cfg, tc, psize=4, batch_size=2,
                           verbose=False)
    np.testing.assert_allclose(r1["losses"], r2["losses"], rtol=1e-6)
