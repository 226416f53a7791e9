"""Single-chip IST training — the gcn/train_ist.py semantics, TPU-first.

The reference trains its K sub-GCNs *sequentially* in a Python loop
(train_ist.py:168-225).  Here all K subnets train simultaneously under
one ``vmap``: the stacked sub-params (leading subnet axis) are updated
by a single Adam step whose loss is the sum of per-subnet losses —
gradients stay independent because the subnets share no parameters, and
Adam is elementwise, so this is numerically identical to K separate
optimizers while keeping the MXU busy with batched matmuls.

Cadence (train_ist.py:140-299): repartition + fresh Adam every
``iter_per_site`` epochs with the 50%/75% LR decay; merge back every
``iter_per_site`` epochs and at the end; evaluate the (possibly stale)
full model every epoch.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gist_tpu.data.container import Dataset
from gist_tpu.graph import graph_from_edges
from gist_tpu.ist.partition import boundary_sizes, sample_boundaries
from gist_tpu.ist.slicing import dispatch_all, merge
from gist_tpu.models import gcn
from gist_tpu.models.common import masked_accuracy, masked_cross_entropy
from gist_tpu.train.common import TrainConfig, make_optimizer, reference_lr_schedule


def train_ist_simulation(
    ds: Dataset,
    model_cfg,
    tc: TrainConfig,
    *,
    model=gcn,
    kind: str = "gcn",
    fused: bool = False,
    verbose: bool = True,
) -> dict:
    """``fused=True`` jits one whole IST round (dispatch -> lax.scan of
    ``iter_per_site`` parallel-subnet steps -> merge -> eval) per call,
    reducing host dispatches from n_epochs*4 to n_rounds; metrics are
    then per round rather than per epoch (the per-epoch numbers the
    reference prints between merges are stale reads of the same model).
    """
    if fused:
        return _train_ist_fused(ds, model_cfg, tc, model=model, kind=kind,
                                verbose=verbose)
    return _train_ist_loop(ds, model_cfg, tc, model=model, kind=kind,
                           verbose=verbose)


def _train_ist_loop(
    ds: Dataset,
    model_cfg,
    tc: TrainConfig,
    *,
    model=gcn,
    kind: str = "gcn",
    verbose: bool = True,
) -> dict:
    K = tc.num_subnet
    graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    train_mask = jnp.asarray(ds.train_mask)
    val_mask = jnp.asarray(ds.val_mask)
    test_mask = jnp.asarray(ds.test_mask)

    full_params = model.init(jax.random.PRNGKey(tc.seed), model_cfg)
    sub_cfg = model_cfg.sub_config(
        split_input=tc.split_input, split_output=tc.split_output,
        num_subnet=K)
    sizes = boundary_sizes(
        model_cfg.in_feats, model_cfg.n_hidden, model_cfg.n_layers,
        split_input=tc.split_input, split_output=tc.split_output)

    opt = optax.inject_hyperparams(make_optimizer,
                                   static_args=("weight_decay",))(
        lr=tc.lr, weight_decay=tc.weight_decay)

    @jax.jit
    def subnet_steps(stacked, opt_state, bnds, key):
        """One local SGD step for all K subnets at once."""
        keys = jax.random.split(key, K)

        def loss_fn(stacked_p):
            def per_subnet(sub_p, s, k):
                xin = x if bnds[0] is None else jnp.take(x, bnds[0][s], axis=1)
                logits = model.apply(sub_p, graph, xin, sub_cfg, train=True,
                                     dropout_key=k)
                return masked_cross_entropy(logits, labels, train_mask)

            losses = jax.vmap(per_subnet)(stacked_p, jnp.arange(K), keys)
            return jnp.sum(losses), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(stacked)
        updates, opt_state = opt.update(grads, opt_state, stacked)
        stacked = optax.apply_updates(stacked, updates)
        return stacked, opt_state, losses

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, graph, x, model_cfg)
        return (masked_accuracy(logits, labels, val_mask),
                masked_accuracy(logits, labels, test_mask))

    jit_dispatch = jax.jit(partial(dispatch_all, num_subnet=K, kind=kind))
    jit_merge = jax.jit(partial(merge, num_subnet=K, kind=kind))

    part_key = jax.random.PRNGKey(tc.seed + 1)
    drop_key = jax.random.PRNGKey(tc.dropout_seed)
    bnds = None
    stacked = None
    opt_state = None
    durs, val_accs, test_accs, losses_hist = [], [], [], []
    for epoch in range(tc.n_epochs):
        t0 = time.time()
        if epoch % tc.iter_per_site == 0:
            part_key, sk = jax.random.split(part_key)
            bnds = sample_boundaries(sk, sizes, K)
            stacked = jit_dispatch(full_params, bnds)
            lr = reference_lr_schedule(tc.lr, tc.n_epochs, epoch)
            opt_state = opt.init(stacked)
            opt_state.hyperparams["lr"] = jnp.asarray(lr)
        drop_key, dk = jax.random.split(drop_key)
        stacked, opt_state, losses = subnet_steps(stacked, opt_state, bnds, dk)
        if ((epoch + 1) % tc.iter_per_site == 0) or (epoch == tc.n_epochs - 1):
            full_params = jit_merge(full_params, bnds, stacked)
        jax.block_until_ready(stacked)
        if epoch >= 3:
            durs.append(time.time() - t0)
        va, ta = evaluate(full_params)
        val_accs.append(float(va))
        test_accs.append(float(ta))
        losses_hist.append(float(jnp.mean(losses)))

    mean_dur = float(np.mean(durs)) if durs else 0.0
    kteps = graph.n_edges / mean_dur / 1000 if mean_dur else 0.0
    results = {
        "dataset": ds.name,
        "num_subnet": K,
        "final_test_acc": test_accs[-1],
        "best_val_acc": max(val_accs),
        "best_test_acc": max(test_accs),
        "val_accs": val_accs,
        "test_accs": test_accs,
        "losses": losses_hist,
        "mean_epoch_s": mean_dur,
        "kteps": kteps,
        "train_time": mean_dur * max(len(durs), 1),
    }
    if verbose:
        print(f"Final Test Accuracy: {test_accs[-1]:.4f}")
        print(f"Best Val Accuracy: {max(val_accs):.4f}")
        print(f"Best Test Accuracy: {max(test_accs):.4f}")
        print(f"ETputs(KTEPS) {kteps:.2f}")
    return results


def _train_ist_fused(
    ds: Dataset,
    model_cfg,
    tc: TrainConfig,
    *,
    model=gcn,
    kind: str = "gcn",
    verbose: bool = True,
) -> dict:
    K = tc.num_subnet
    graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    train_mask = jnp.asarray(ds.train_mask)
    val_mask = jnp.asarray(ds.val_mask)
    test_mask = jnp.asarray(ds.test_mask)

    full_params = model.init(jax.random.PRNGKey(tc.seed), model_cfg)
    sub_cfg = model_cfg.sub_config(
        split_input=tc.split_input, split_output=tc.split_output,
        num_subnet=K)
    sizes = boundary_sizes(
        model_cfg.in_feats, model_cfg.n_hidden, model_cfg.n_layers,
        split_input=tc.split_input, split_output=tc.split_output)
    # lr scales updates inside the scan (optimizer built at lr=1)
    opt = make_optimizer(1.0, tc.weight_decay)

    @partial(jax.jit, static_argnames=("n_steps",))
    def ist_round(full_params, part_key, drop_key, lr, n_steps):
        bnds = sample_boundaries(part_key, sizes, K)
        stacked = dispatch_all(full_params, bnds, K, kind)
        opt_state = opt.init(stacked)

        def step(carry, key):
            stacked, opt_state = carry
            keys = jax.random.split(key, K)

            def loss_fn(sp):
                def per_subnet(sub_p, s, k):
                    xin = (x if bnds[0] is None
                           else jnp.take(x, bnds[0][s], axis=1))
                    logits = model.apply(sub_p, graph, xin, sub_cfg,
                                         train=True, dropout_key=k)
                    return masked_cross_entropy(logits, labels, train_mask)

                losses = jax.vmap(per_subnet)(sp, jnp.arange(K), keys)
                return jnp.sum(losses), losses

            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(stacked)
            updates, opt_state = opt.update(grads, opt_state, stacked)
            updates = jax.tree.map(lambda u: u * lr, updates)
            stacked = optax.apply_updates(stacked, updates)
            return (stacked, opt_state), jnp.mean(losses)

        step_keys = jax.random.split(drop_key, n_steps)
        (stacked, _), losses = jax.lax.scan(
            step, (stacked, opt_state), step_keys)
        full_params = merge(full_params, bnds, stacked, K, kind)
        logits = model.apply(full_params, graph, x, model_cfg)
        va = masked_accuracy(logits, labels, val_mask)
        ta = masked_accuracy(logits, labels, test_mask)
        return full_params, losses, va, ta

    part_key = jax.random.PRNGKey(tc.seed + 1)
    drop_key = jax.random.PRNGKey(tc.dropout_seed)
    n_rounds = max(tc.n_epochs // tc.iter_per_site, 1)
    tail = tc.n_epochs - n_rounds * tc.iter_per_site

    durs, val_accs, test_accs, losses_hist = [], [], [], []
    rounds = [tc.iter_per_site] * n_rounds + ([tail] if tail > 0 else [])
    for rnd, n_steps in enumerate(rounds):
        epoch0 = rnd * tc.iter_per_site
        lr = reference_lr_schedule(tc.lr, tc.n_epochs, epoch0)
        part_key, pk = jax.random.split(part_key)
        drop_key, dk = jax.random.split(drop_key)
        t0 = time.time()
        full_params, rl, va, ta = ist_round(
            full_params, pk, dk, jnp.asarray(lr), n_steps)
        jax.block_until_ready(full_params)
        if rnd > 0:
            durs.append((time.time() - t0) / n_steps)
        val_accs.append(float(va))
        test_accs.append(float(ta))
        losses_hist.append(float(jnp.mean(rl)))

    mean_dur = float(np.mean(durs)) if durs else 0.0
    kteps = graph.n_edges / mean_dur / 1000 if mean_dur else 0.0
    results = {
        "dataset": ds.name, "num_subnet": K, "fused": True,
        "final_test_acc": test_accs[-1], "best_val_acc": max(val_accs),
        "best_test_acc": max(test_accs), "val_accs": val_accs,
        "test_accs": test_accs, "losses": losses_hist,
        "mean_epoch_s": mean_dur, "kteps": kteps,
        "train_time": mean_dur * tc.n_epochs,
    }
    if verbose:
        print(f"Final Test Accuracy: {test_accs[-1]:.4f}")
        print(f"Best Val Accuracy: {max(val_accs):.4f}")
        print(f"Best Test Accuracy: {max(test_accs):.4f}")
        print(f"ETputs(KTEPS) {kteps:.2f}")
    return results
