"""Full-graph GCN training — the gcn/train.py baseline, jit end-to-end.

One jitted train step (forward + masked CE + Adam) and one jitted eval;
wall-clock accounting matches the reference (first 3 epochs excluded as
warm-up, train.py:102, eval excluded from step timing) and the
throughput print is the same KTEPS = edges/mean-epoch-sec/1000
(train_ist.py:296-298).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gist_tpu.data.container import Dataset
from gist_tpu.graph import Graph, graph_from_edges
from gist_tpu.models import gcn
from gist_tpu.models.common import masked_accuracy, masked_cross_entropy
from gist_tpu.train.common import (TrainConfig, make_optimizer,
                                   reference_lr_schedule)


def prepare_graph(ds: Dataset, tiles: Optional[bool] = None) -> Graph:
    if tiles is None:
        # build the pallas tile layout iff a pallas-capable backend is
        # active (explicit "pallas", or "auto" on real TPU hardware)
        from gist_tpu.ops import spmm as _spmm
        tiles = _spmm.tiles_wanted()
    return graph_from_edges(ds.senders, ds.receivers, ds.n_nodes,
                            tiles=tiles)


def train_full_graph(
    ds: Dataset,
    model_cfg: gcn.GCNConfig,
    tc: TrainConfig,
    *,
    model=gcn,
    scan_epochs: int = 0,
    verbose: bool = True,
) -> dict:
    """``scan_epochs > 0`` runs that many epochs per jitted call via
    lax.scan (train step + eval fused on device) — amortizes dispatch
    overhead; metrics land in one bulk device->host fetch per block."""
    if scan_epochs > 0:
        return _train_full_graph_scanned(ds, model_cfg, tc, model=model,
                                         scan_epochs=scan_epochs,
                                         verbose=verbose)
    return _train_full_graph_loop(ds, model_cfg, tc, model=model,
                                  verbose=verbose)


def _train_full_graph_loop(
    ds: Dataset,
    model_cfg: gcn.GCNConfig,
    tc: TrainConfig,
    *,
    model=gcn,
    verbose: bool = True,
) -> dict:
    graph = prepare_graph(ds)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    train_mask = jnp.asarray(ds.train_mask)
    val_mask = jnp.asarray(ds.val_mask)
    test_mask = jnp.asarray(ds.test_mask)

    params = model.init(jax.random.PRNGKey(tc.seed), model_cfg)
    # LR enters via a mutable scalar so the /10-at-50/75% schedule
    # doesn't retrigger compilation (optax injected hyperparams).
    opt = optax.inject_hyperparams(make_optimizer,
                                   static_args=("weight_decay",))(
        lr=tc.lr, weight_decay=tc.weight_decay)
    opt_state = opt.init(params)

    # NB: the graph travels as a jit ARGUMENT, not a closure constant —
    # closed-over arrays get embedded in the HLO as literals, which for
    # tile layouts (100+ MB of W blocks) breaks compilation outright.
    @jax.jit
    def train_step(graph, params, opt_state, key):
        def loss_fn(p):
            logits = model.apply(p, graph, x, model_cfg, train=True,
                                 dropout_key=key)
            return masked_cross_entropy(logits, labels, train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def evaluate(graph, params):
        logits = model.apply(params, graph, x, model_cfg)
        return (masked_accuracy(logits, labels, val_mask),
                masked_accuracy(logits, labels, test_mask))

    key = jax.random.PRNGKey(tc.dropout_seed)
    durs = []
    val_accs, test_accs, losses = [], [], []
    for epoch in range(tc.n_epochs):
        if tc.lr_schedule:
            opt_state.hyperparams["lr"] = jnp.asarray(
                reference_lr_schedule(tc.lr, tc.n_epochs, epoch))
        key, step_key = jax.random.split(key)
        t0 = time.time()
        params, opt_state, loss = train_step(graph, params, opt_state,
                                             step_key)
        loss.block_until_ready()
        if epoch >= 3:  # warm-up epochs excluded (train.py:102)
            durs.append(time.time() - t0)
        va, ta = evaluate(graph, params)
        val_accs.append(float(va))
        test_accs.append(float(ta))
        losses.append(float(loss))

    mean_dur = float(np.mean(durs)) if durs else 0.0
    kteps = graph.n_edges / mean_dur / 1000 if mean_dur else 0.0
    results = {
        "dataset": ds.name,
        "final_test_acc": test_accs[-1],
        "best_val_acc": max(val_accs),
        "best_test_acc": max(test_accs),
        "val_accs": val_accs,
        "test_accs": test_accs,
        "losses": losses,
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


def _train_full_graph_scanned(
    ds: Dataset,
    model_cfg,
    tc: TrainConfig,
    *,
    model=gcn,
    scan_epochs: int,
    verbose: bool = True,
) -> dict:
    """lax.scan over epochs: the optimizer is built with lr=1 and the
    per-epoch LR (the 50%/75% decay schedule) scales the updates inside
    the scan, which keeps the whole schedule jit-static."""
    graph = prepare_graph(ds)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    train_mask = jnp.asarray(ds.train_mask)
    val_mask = jnp.asarray(ds.val_mask)
    test_mask = jnp.asarray(ds.test_mask)

    params = model.init(jax.random.PRNGKey(tc.seed), model_cfg)
    opt = make_optimizer(1.0, tc.weight_decay)
    opt_state = opt.init(params)

    lrs = jnp.asarray([
        reference_lr_schedule(tc.lr, tc.n_epochs, e) if tc.lr_schedule
        else tc.lr for e in range(tc.n_epochs)], dtype=jnp.float32)

    @partial(jax.jit, static_argnames=("k",))
    def run_block(graph, params, opt_state, key, lr_block, k):
        def epoch(carry, lr_e):
            params, opt_state, key = carry
            key, dk = jax.random.split(key)

            def loss_fn(p):
                logits = model.apply(p, graph, x, model_cfg, train=True,
                                     dropout_key=dk)
                return masked_cross_entropy(logits, labels, train_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr_e, updates)
            params = optax.apply_updates(params, updates)
            logits = model.apply(params, graph, x, model_cfg)
            va = masked_accuracy(logits, labels, val_mask)
            ta = masked_accuracy(logits, labels, test_mask)
            return (params, opt_state, key), (loss, va, ta)

        (params, opt_state, key), metrics = jax.lax.scan(
            epoch, (params, opt_state, key), lr_block, length=k)
        return params, opt_state, key, metrics

    key = jax.random.PRNGKey(tc.dropout_seed)
    losses, val_accs, test_accs = [], [], []
    durs = []
    done = 0
    while done < tc.n_epochs:
        k = min(scan_epochs, tc.n_epochs - done)
        t0 = time.time()
        params, opt_state, key, (l, va, ta) = run_block(
            graph, params, opt_state, key, lrs[done:done + k], k)
        jax.block_until_ready(l)
        dt = time.time() - t0
        if done > 0:
            # first block carries the jit compile; exclude it entirely
            # (the loop path's 3-epoch warm-up analog, train.py:102)
            durs.append(dt / k)
        losses += [float(v) for v in l]
        val_accs += [float(v) for v in va]
        test_accs += [float(v) for v in ta]
        done += k

    mean_dur = float(np.mean(durs)) if durs else 0.0
    kteps = graph.n_edges / mean_dur / 1000 if mean_dur else 0.0
    results = {
        "dataset": ds.name,
        "final_test_acc": test_accs[-1],
        "best_val_acc": max(val_accs),
        "best_test_acc": max(test_accs),
        "val_accs": val_accs,
        "test_accs": test_accs,
        "losses": losses,
        "mean_epoch_s": mean_dur,
        "kteps": kteps,
        "train_time": mean_dur * tc.n_epochs,
        "scan_epochs": scan_epochs,
    }
    if verbose:
        print(f"Final Test Accuracy: {test_accs[-1]:.4f}")
        print(f"Best Val Accuracy: {max(val_accs):.4f}")
        print(f"Best Test Accuracy: {max(test_accs):.4f}")
        print(f"ETputs(KTEPS) {kteps:.2f}")
    return results
