"""Ultra-wide distributed IST trainer — cluster_gcn_ist_ultra_wide.py
parity: the full-width model lives in host RAM; devices only ever hold
1/K-width sub-models.  See gist_tpu/ist/ultrawide.py for mechanics.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gist_tpu.data.container import Dataset
from gist_tpu.graph import graph_from_edges
from gist_tpu.ist.distributed import make_subnet_mesh
from gist_tpu.ist.partition import boundary_sizes
from gist_tpu.ist.ultrawide import (build_local_burst,
                                    build_local_burst_single,
                                    dispatch_host, merge_host,
                                    sample_boundaries_host,
                                    shard_over_subnets)
from gist_tpu.models import sage
from gist_tpu.models.common import micro_f1
from gist_tpu.sampler import ClusterSampler
from gist_tpu.train.common import TrainConfig
from gist_tpu.train.ist_cluster import _RoundCollector, _stack_batches


def train_ist_ultrawide(
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
    kind: str = "sage",
    mesh=None,
    eval_on_cpu: bool = True,
    eval_every_rounds: int = 1,
    checkpoint_dir: Optional[str] = None,
    sequential: Optional[bool] = None,
    verbose: bool = True,
) -> dict:
    """``sequential=True`` runs the K subnets one after another on a
    single device instead of over a K-device ``subnet`` mesh — the
    ultra-wide analog of the reference's single-process simulation
    (train_ist.py:209-225): only one 1/K-width sub-model (plus its
    optimizer state) is ever resident on the chip, so hidden widths
    beyond HBM still train on ONE accelerator.  Defaults to automatic:
    sequential iff no mesh was passed and fewer than K devices exist."""
    K = tc.num_subnet
    if normalize:
        ds.normalize_features()
    if sequential is None:
        sequential = mesh is None and len(jax.devices()) < K
    if not sequential:
        mesh = mesh or make_subnet_mesh(K)
    sampler = ClusterSampler(ds, psize, batch_size, use_pp=use_pp,
                             cache_dir=cache_dir, seed=tc.seed)

    # full-width params: HOST numpy (the whole point — ultra_wide.py:78-86).
    # copy=True: np.asarray views of jax arrays are read-only, and
    # merge_host scatters in place.
    full_params = jax.tree.map(
        lambda a: np.array(a, copy=True),
        model.init(jax.random.PRNGKey(tc.seed), model_cfg))
    sub_cfg = model_cfg.sub_config(split_input=False, split_output=True,
                                   num_subnet=K)
    sizes = boundary_sizes(model_cfg.in_feats, model_cfg.n_hidden,
                           model_cfg.n_layers, split_input=False,
                           split_output=True)
    if sequential:
        burst_fn = build_local_burst_single(model, sub_cfg,
                                            weight_decay=tc.weight_decay)
    else:
        burst_fn = build_local_burst(model, sub_cfg, mesh=mesh,
                                     weight_decay=tc.weight_decay)

    # full-graph eval on the CPU backend (--eval-cpu, cluster_gcn.py:110-127)
    # resolved lazily: the chunked host eval never needs a jax CPU device
    def _eval_device():
        return (jax.devices("cpu")[0] if eval_on_cpu
                else jax.devices()[0])
    eval_graph = None

    # full-graph eval at ultra-wide widths: activations (N x 2h fp32
    # concat) can exceed both HBM and comfortable host RAM — use the
    # chunked host forward beyond ~2^28 activation elements
    chunked_eval = (kind == "sage" and eval_on_cpu
                    and ds.n_nodes * model_cfg.n_hidden > 2 ** 28)

    def evaluate(params_np):
        nonlocal eval_graph
        if chunked_eval:
            l = sage.apply_chunked_host(params_np, ds.senders,
                                        ds.receivers, ds.features,
                                        model_cfg)
        else:
            with jax.default_device(_eval_device()):
                if eval_graph is None:
                    eval_graph = graph_from_edges(ds.senders, ds.receivers,
                                                  ds.n_nodes)
                p = jax.tree.map(jnp.asarray, params_np)
                logits = model.apply(p, eval_graph,
                                     jnp.asarray(ds.features), model_cfg)
                l = np.asarray(logits)
        if use_f1:
            return (micro_f1(l, ds.labels, ds.val_mask),
                    micro_f1(l, ds.labels, ds.test_mask))
        pred = l.argmax(-1)
        va = float((pred[ds.val_mask] == ds.labels[ds.val_mask]).mean())
        ta = float((pred[ds.test_mask] == ds.labels[ds.test_mask]).mean()) \
            if ds.test_mask.any() else va
        return va, ta

    local_epochs = max(tc.n_epochs // K, 1)
    n_rounds = max(local_epochs * len(sampler) // tc.iter_per_site, 1)
    collector = _RoundCollector(sampler, tc.iter_per_site,
                                ids_only=True)
    tables = sampler.tables()
    host_rng = np.random.default_rng(tc.seed + 1)
    drop_key = jax.random.PRNGKey(tc.dropout_seed)

    start_round = 0
    if checkpoint_dir:
        from gist_tpu.train.checkpoint import (latest_round_dir,
                                               load_checkpoint,
                                               save_checkpoint)
        ck = latest_round_dir(checkpoint_dir)
        if ck is not None:
            state = load_checkpoint(ck)
            full_params = jax.tree.map(
                lambda a: np.array(a, copy=True), state["params"])
            drop_key = jnp.asarray(state["drop_key"])
            start_round = int(state["round"]) + 1
            # replay the consumed randomness (partition sampling and
            # cluster order) so the sequence continues unchanged
            for _ in range(start_round):
                sample_boundaries_host(host_rng, sizes, K)
                collector.collect()
            if verbose:
                print(f"resumed from {ck} (round {start_round})",
                      flush=True)

    total_time = 0.0
    val_accs, test_accs, losses = [], [], []
    round_wall, host_prep, device_sync = [], [], []
    # time-to-accuracy instrumentation: which round each eval happened
    # at, the cumulative train wall at that point (eval excluded, the
    # reference's timing convention), and the eval's own wall; plus
    # per-round 1-min loadavg + RSS so round-wall drift can be
    # attributed (round-3's h1024 drift was un-diagnosed — on a 4-core
    # host any concurrent job shows up directly in loadavg here)
    eval_rounds, train_time_at_eval, eval_wall = [], [], []
    loadavg_1m, rss_gb = [], []

    def _sysstat():
        try:
            import resource
            loadavg_1m.append(round(__import__("os").getloadavg()[0], 2))
            rss_gb.append(round(resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 2 ** 20, 2))
        except Exception:
            pass
    def _do_eval(rnd):
        te0 = time.time()
        va, ta = evaluate(full_params)
        eval_wall.append(time.time() - te0)
        eval_rounds.append(rnd)
        train_time_at_eval.append(total_time)
        val_accs.append(va)
        test_accs.append(ta)
        if verbose:
            print(f"round {rnd}/{n_rounds}: loss {losses[-1]:.4f} "
                  f"val {va:.4f}", flush=True)
        if checkpoint_dir:
            import os
            save_checkpoint(
                os.path.join(checkpoint_dir, f"round_{rnd}"),
                {"params": full_params, "round": rnd,
                 "drop_key": np.asarray(drop_key)})
            # partial-progress artifact: a timeout-killed run still
            # leaves its curve + timing on disk (atomic rename)
            import json
            part = {
                "partial": True, "round": rnd, "n_rounds": n_rounds,
                "dataset": ds.name, "num_subnet": K,
                "train_time": total_time, "val_accs": val_accs,
                "test_accs": test_accs, "losses": losses,
                "round_wall_s": round_wall, "host_prep_s": host_prep,
                "device_sync_s": device_sync,
                "eval_rounds": eval_rounds,
                "train_time_at_eval": train_time_at_eval,
                "eval_wall_s": eval_wall,
                "loadavg_1m": loadavg_1m, "rss_gb": rss_gb,
            }
            pp = os.path.join(checkpoint_dir, "progress.json")
            with open(pp + ".tmp", "w") as f:
                json.dump(part, f)
            os.replace(pp + ".tmp", pp)

    if start_round >= n_rounds:
        va, ta = evaluate(full_params)
        val_accs.append(va)
        test_accs.append(ta)
        losses.append(float("nan"))
    else:
        stacked_batches = _stack_batches(collector.collect())
    for rnd in range(start_round, n_rounds):
        t0 = time.time()
        bnds = sample_boundaries_host(host_rng, sizes, K)
        drop_key, dk = jax.random.split(drop_key)
        if sequential:
            # one subnet on the device at a time (HBM holds 1/K width);
            # next round's batch collection overlaps subnet 0's burst
            shards_np = dispatch_host(full_params, bnds, K, kind)
            t1 = time.time()
            trained_list, loss_list, t_prep = [], [], 0.0
            for s in range(K):
                sub = jax.tree.map(lambda a: jnp.asarray(a[s]), shards_np)
                sub, rl = burst_fn(sub, stacked_batches,
                                   jnp.asarray(tc.lr), dk,
                                   jnp.asarray(s), tables)
                if s == 0 and rnd + 1 < n_rounds:
                    tp = time.time()
                    next_batches = _stack_batches(collector.collect())
                    t_prep = time.time() - tp
                trained_list.append(jax.tree.map(np.asarray, sub))
                loss_list.append(np.asarray(rl))
            trained = jax.tree.map(lambda *xs: np.stack(xs),
                                   *trained_list)
            t3 = time.time()
            full_params = merge_host(full_params, bnds, trained, K, kind)
            if rnd + 1 < n_rounds:
                stacked_batches = next_batches
            total_time += time.time() - t0
            round_wall.append(time.time() - t0)
            host_prep.append(t_prep)
            device_sync.append(t3 - t1 - t_prep)
            losses.append(float(np.mean(np.asarray(loss_list))))
            _sysstat()
            if (rnd + 1) % eval_every_rounds == 0 or rnd == n_rounds - 1:
                _do_eval(rnd)
            continue
        shards = shard_over_subnets(mesh, dispatch_host(
            full_params, bnds, K, kind))       # one H2D per round
        # async dispatch: burst_fn returns futures immediately, so the
        # next round's host-side batch collection/padding runs WHILE the
        # device executes the burst (round wall ~ max(burst, host prep)
        # instead of their sum — SURVEY §7.3's named improvement over
        # ultra_wide.py:143-204's serial staging).  Instrumentation for
        # the overlap claim: host prep runs under the in-flight burst,
        # device_sync is what remains of the burst after prep finishes
        # (so burst ~ prep + sync when the device is the long pole, and
        # the serial design would cost wall + prep more).
        shards, rl = burst_fn(shards, stacked_batches,
                              jnp.asarray(tc.lr), dk, tables)
        t1 = time.time()
        if rnd + 1 < n_rounds:
            stacked_batches = _stack_batches(collector.collect())
        t2 = time.time()
        trained = jax.tree.map(np.asarray, shards)   # one D2H per round
        t3 = time.time()
        full_params = merge_host(full_params, bnds, trained, K, kind)
        total_time += time.time() - t0
        round_wall.append(time.time() - t0)
        host_prep.append(t2 - t1)
        device_sync.append(t3 - t2)
        losses.append(float(np.mean(np.asarray(rl))))
        _sysstat()
        if (rnd + 1) % eval_every_rounds == 0 or rnd == n_rounds - 1:
            _do_eval(rnd)

    results = {
        "dataset": ds.name, "num_subnet": K, "train_time": total_time,
        "last_val": val_accs[-1], "best_val": max(val_accs),
        "last_test": test_accs[-1], "best_test": max(test_accs),
        "val_accs": val_accs, "test_accs": test_accs, "losses": losses,
        "ultra_wide": True,
        "round_wall_s": round_wall, "host_prep_s": host_prep,
        "device_sync_s": device_sync,
        "eval_rounds": eval_rounds,
        "train_time_at_eval": train_time_at_eval,
        "eval_wall_s": eval_wall,
        "loadavg_1m": loadavg_1m, "rss_gb": rss_gb,
    }
    if verbose:
        print(f"Training Time: {total_time:.4f}", flush=True)
        print(f"Last Val: {val_accs[-1]:.4f}", flush=True)
        print(f"Best Val: {max(val_accs):.4f}", flush=True)
        print(f"Last Test: {test_accs[-1]:.4f}", flush=True)
        print(f"Best Test: {max(test_accs):.4f}", flush=True)
    return results
