"""Cluster-GCN training on one chip — cluster_gcn/cluster_gcn.py parity.

Per-cluster jitted train steps (compiled once per padding bucket), full
graph eval each epoch, wall clock excluding eval (cluster_gcn.py:91-111).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gist_tpu.data.container import Dataset
from gist_tpu.graph import graph_from_edges
from gist_tpu.models import sage
from gist_tpu.models.common import (masked_accuracy, masked_bce_multitask,
                                    masked_cross_entropy, micro_f1)
from gist_tpu.sampler import ClusterBatch, ClusterSampler
from gist_tpu.train.common import TrainConfig, make_optimizer


def train_cluster_gcn(
    ds: Dataset,
    model_cfg: sage.SAGEConfig,
    tc: TrainConfig,
    *,
    psize: int = 1500,
    batch_size: int = 20,
    use_pp: bool = False,
    use_f1: bool = False,
    normalize: bool = False,
    cache_dir: Optional[str] = None,
    model=sage,
    eval_every: int = 1,
    eval_cpu: bool = False,
    scan_batches: bool = False,
    verbose: bool = True,
) -> dict:
    """``scan_batches=True`` stacks each epoch's cluster batches
    (re-padded to one bucket) and runs them in a single lax.scan jit —
    one dispatch per epoch instead of one per batch."""
    if normalize:
        ds.normalize_features()
    # multitask (ppi): sigmoid BCE on the multi-hot matrix + threshold
    # micro-F1, like the reference's multitask branch
    multitask = ds.labels_multi is not None
    train_loss = masked_bce_multitask if multitask else masked_cross_entropy
    sampler = ClusterSampler(ds, psize, batch_size, use_pp=use_pp,
                             cache_dir=cache_dir, seed=tc.seed)
    full_graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    fx = jnp.asarray(ds.features)
    flabels = jnp.asarray(ds.labels)
    val_mask = jnp.asarray(ds.val_mask)
    test_mask = jnp.asarray(ds.test_mask)

    params = model.init(jax.random.PRNGKey(tc.seed), model_cfg)
    opt = make_optimizer(tc.lr, tc.weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch: ClusterBatch, key):
        def loss_fn(p):
            logits = model.apply(p, batch.graph, batch.features, model_cfg,
                                 train=True, dropout_key=key)
            return train_loss(logits, batch.labels, batch.train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def train_epoch_scanned(params, opt_state, stacked, key, tables):
        def body(carry, batch):
            params, opt_state, key = carry
            key, dk = jax.random.split(key)
            graph, feats, labels, mask = ClusterSampler.resolve_batch(
                batch, tables)

            def loss_fn(p):
                logits = model.apply(p, graph, feats, model_cfg,
                                     train=True, dropout_key=dk)
                return train_loss(logits, labels, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, key), stacked)
        return params, opt_state, losses

    # --eval-cpu: big models evaluate the full graph on the host
    # (cluster_gcn.py:110-127); otherwise on the accelerator
    eval_device = jax.devices("cpu")[0] if eval_cpu else None
    cpu_data = {}

    @jax.jit
    def infer_full(params):
        # eval never uses the use_pp skip (modules.py:133 train-only)
        return model.apply(params, full_graph, fx, model_cfg)

    def evaluate(params):
        if eval_device is not None:
            if not cpu_data:
                cpu_data["g"] = jax.device_put(full_graph, eval_device)
                cpu_data["x"] = jax.device_put(fx, eval_device)
            p = jax.device_put(params, eval_device)
            logits = model.apply(p, cpu_data["g"], cpu_data["x"], model_cfg)
        else:
            logits = infer_full(params)
        if multitask:
            l = np.asarray(logits)
            return (micro_f1(l, ds.labels_multi, ds.val_mask,
                             multitask=True),
                    micro_f1(l, ds.labels_multi, ds.test_mask,
                             multitask=True))
        if use_f1:
            l = np.asarray(logits)
            return (micro_f1(l, ds.labels, ds.val_mask),
                    micro_f1(l, ds.labels, ds.test_mask))
        return (float(masked_accuracy(logits, flabels, val_mask)),
                float(masked_accuracy(logits, flabels, test_mask)))

    key = jax.random.PRNGKey(tc.dropout_seed)
    total_time = 0.0
    total_edges = 0
    epoch_times = []        # per-epoch wall clock (epoch 0 = compile)
    epoch_edges = []
    val_accs, test_accs, losses = [], [], []
    from gist_tpu.utils import prefetch

    from gist_tpu.train.ist_cluster import _RoundCollector, _stack_batches
    collector = _RoundCollector(sampler, len(sampler), ids_only=True) \
        if scan_batches else None
    tables = sampler.tables() if scan_batches else None

    def run_epoch_scanned():
        """One dispatch per epoch: collect the epoch's batches at a
        common padding bucket, stack, scan."""
        batches = collector.collect()
        stacked = _stack_batches(batches)
        return stacked, sum(b.n_real_edges for b in batches), len(batches)

    for epoch in range(tc.n_epochs):
        t0 = time.time()
        epoch_loss = 0.0
        nb = 0
        if scan_batches:
            stacked, e_real, nb = run_epoch_scanned()
            key, dk = jax.random.split(key)
            params, opt_state, step_losses = train_epoch_scanned(
                params, opt_state, stacked, dk, tables)
            epoch_loss = float(jnp.sum(step_losses))
            total_edges += e_real
        else:
            for batch in prefetch(sampler):
                key, dk = jax.random.split(key)
                params, opt_state, loss = train_step(params, opt_state,
                                                     batch, dk)
                epoch_loss += float(loss)
                total_edges += batch.n_real_edges
                nb += 1
        jax.block_until_ready(params)
        dt = time.time() - t0  # eval excluded (cluster_gcn.py:91-108)
        total_time += dt
        epoch_times.append(dt)
        epoch_edges.append(total_edges - sum(epoch_edges))
        evaluated = (epoch + 1) % eval_every == 0 or epoch == tc.n_epochs - 1
        if evaluated:
            va, ta = evaluate(params)
            val_accs.append(va)
            test_accs.append(ta)
        losses.append(epoch_loss / max(nb, 1))
        if verbose:
            val_s = f"val {val_accs[-1]:.4f}" if evaluated else \
                f"epoch_s {dt:.2f}"
            print(f"Epoch {epoch}: loss {losses[-1]:.4f} {val_s}",
                  flush=True)

    # steady state excludes epoch 0 (jit compile dominates it on TPU)
    steady_t = sum(epoch_times[1:])
    steady_e = sum(epoch_edges[1:])
    results = {
        "dataset": ds.name,
        "train_time": total_time,
        "edges_per_sec": total_edges / total_time if total_time else 0.0,
        "steady_epoch_s": steady_t / max(len(epoch_times) - 1, 1),
        "steady_edges_per_sec": steady_e / steady_t if steady_t else 0.0,
        "last_val": val_accs[-1], "best_val": max(val_accs),
        "last_test": test_accs[-1], "best_test": max(test_accs),
        "val_accs": val_accs, "test_accs": test_accs, "losses": losses,
    }
    if verbose:
        print(f"Training Time: {total_time:.4f}", flush=True)
        print(f"Last Val: {val_accs[-1]:.4f}", flush=True)
        print(f"Best Val: {max(val_accs):.4f}", flush=True)
        print(f"Last Test: {test_accs[-1]:.4f}", flush=True)
        print(f"Best Test: {max(test_accs):.4f}", flush=True)
    return results
