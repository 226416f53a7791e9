"""Distributed IST on the virtual 8-device CPU mesh (shard_map)."""

import numpy as np
import jax
import jax.numpy as jnp

from gist_tpu.data import synthetic_dataset
from gist_tpu.ist.distributed import (build_ist_round, make_subnet_mesh,
                                      run_distributed_ist)
from gist_tpu.ist.partition import boundary_sizes, sample_boundaries
from gist_tpu.models import gcn, sage
from gist_tpu.train.common import TrainConfig


def test_mesh_creation():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    mesh = make_subnet_mesh(4)
    assert mesh.shape == {"subnet": 4}


def test_distributed_ist_full_graph_learns():
    ds = synthetic_dataset("synth-tiny")
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        dropout=0.0)
    tc = TrainConfig(lr=1e-2, weight_decay=5e-4, n_epochs=20, num_subnet=4,
                     iter_per_site=5, split_output=True)
    res = run_distributed_ist(ds, cfg, tc, model=gcn, kind="gcn",
                              verbose=False)
    assert res["best_val_acc"] > 0.4, res
    assert len(res["val_accs"]) == 4  # 20 epochs / 5 per round


def test_distributed_round_matches_single_device_semantics():
    """One shard_map round == dispatch + per-subnet local steps + merge
    computed by hand on one device (collectives are just data movement)."""
    from gist_tpu.ist.slicing import dispatch, merge
    from gist_tpu.models.common import masked_cross_entropy
    from gist_tpu.train.common import make_optimizer
    import optax

    ds = synthetic_dataset("synth-tiny")
    K, spr = 2, 3
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        dropout=0.0)
    sub_cfg = cfg.sub_config(split_input=False, split_output=True,
                             num_subnet=K)
    from gist_tpu.graph import graph_from_edges
    graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)

    full = gcn.init(jax.random.PRNGKey(0), cfg)
    sizes = boundary_sizes(cfg.in_feats, cfg.n_hidden, cfg.n_layers,
                           split_input=False, split_output=True)
    bnds = sample_boundaries(jax.random.PRNGKey(1), sizes, K)

    mesh = make_subnet_mesh(K)
    round_fn = build_ist_round(gcn, sub_cfg, mesh=mesh, kind="gcn",
                               num_subnet=K, weight_decay=0.0,
                               split_input=False)
    batches = (
        jax.tree.map(lambda a: jnp.broadcast_to(a, (spr,) + a.shape), graph),
        jnp.broadcast_to(x, (spr,) + x.shape),
        jnp.broadcast_to(labels, (spr,) + labels.shape),
        jnp.broadcast_to(mask, (spr,) + mask.shape),
    )
    key = jax.random.PRNGKey(7)
    got, losses = round_fn(full, bnds, batches, jnp.asarray(1e-2), key,
                           None)
    assert losses.shape[-1] == spr

    # hand-computed reference on one device
    opt = make_optimizer(1e-2, 0.0)
    subs = []
    for s in range(K):
        sub = dispatch(full, bnds, s, "gcn")
        st = opt.init(sub)
        k = jax.random.fold_in(key, s)
        for _ in range(spr):
            k, dk = jax.random.split(k)

            def loss_fn(p):
                logits = gcn.apply(p, graph, x, sub_cfg, train=True,
                                   dropout_key=dk)
                return masked_cross_entropy(logits, labels, mask)

            _, grads = jax.value_and_grad(loss_fn)(sub)
            upd, st = opt.update(grads, st, sub)
            sub = optax.apply_updates(sub, upd)
        subs.append(sub)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subs)
    want = merge(full, bnds, stacked, K, "gcn")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6),
        got, want)


def test_distributed_ist_non_divisible_width():
    """K=3 over hidden=16 (non-divisible): subnets run at ceil width 6
    with virtual units, the shard_map round trains and merges cleanly
    (the reference's torch.chunk tolerance, gcn/train_ist.py:150-166,
    carried to the SPMD engine via VIRTUAL_IDX padding)."""
    ds = synthetic_dataset("synth-tiny")
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        dropout=0.0)
    tc = TrainConfig(lr=1e-2, weight_decay=5e-4, n_epochs=12, num_subnet=3,
                     iter_per_site=4, split_output=True)
    res = run_distributed_ist(ds, cfg, tc, model=gcn, kind="gcn",
                              verbose=False)
    assert res["best_val_acc"] > 0.4, res
    assert np.isfinite(res["val_accs"]).all()
