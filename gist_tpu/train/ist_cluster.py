"""Distributed IST + Cluster-GCN sampling — the full
cluster_gcn_ist_distrib.py pipeline, TPU-native.

Structure per round (= ``iter_per_site`` steps between syncs,
ist_distrib.py:394-427): collect ``iter_per_site`` padded cluster
batches host-side, stack them on a scan axis, and run one jitted
shard_map round (dispatch → scan of local steps → all_gather merge).
Every subnet consumes the identical batch stream, matching the
identically-seeded per-rank cluster iterators of the reference
(run_ist_sweep_reddit.py:68).

Eval runs on the merged full model over the full graph — on the same
chip(s), not a rank-0 parameter server (ist_distrib.py:437-447's
bottleneck removed).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gist_tpu.data.container import Dataset
from gist_tpu.graph import graph_from_edges
from gist_tpu.ist.distributed import build_ist_round, make_subnet_mesh
from gist_tpu.ist.partition import boundary_sizes, sample_boundaries
from gist_tpu.models import sage
from gist_tpu.models.common import masked_accuracy, micro_f1
from gist_tpu.sampler import ClusterSampler
from gist_tpu.train.common import TrainConfig, reference_lr_schedule


def _stack_batches(batches):
    """Stack ClusterBatches (re-padded to a common bucket) on a leading
    scan axis, as the (graph, feats, labels, mask) tuple round_fn scans.

    numpy-leaf batches stack on the host and transfer once; device-leaf
    batches stack on device (an epoch of per-batch H2D transfers costs
    more than the epoch's compute through a remote tunnel)."""
    from gist_tpu.sampler import unify_tile_buckets
    batches = unify_tile_buckets(batches)
    # n_edges is static pytree aux data and varies per batch; normalize
    # to the (shared) padded count so the Graphs stack.
    graphs = [b.graph.replace(n_edges=b.graph.n_edges_padded)
              for b in batches]

    def stack(*xs):
        if isinstance(xs[0], np.ndarray):
            return jnp.asarray(np.stack(xs))
        return jnp.stack(xs)

    g = jax.tree.map(stack, *graphs)
    if batches[0].node_ids is not None:
        return (g, stack(*[b.node_ids for b in batches]))
    feats = stack(*[b.features for b in batches])
    labels = stack(*[b.labels for b in batches])
    masks = stack(*[b.train_mask for b in batches])
    return (g, feats, labels, masks)


class _RoundCollector:
    """Pulls batches off the sampler epoch-by-epoch, re-padding each
    round to its max bucket so the stacked scan has uniform shapes.
    ``ids_only=True`` (pair with ``sampler.tables()`` at the consuming
    scan) ships node ids instead of per-batch feature tensors."""

    def __init__(self, sampler: ClusterSampler, spr: int,
                 ids_only: bool = False):
        self.sampler = sampler
        self.spr = spr
        self.ids_only = ids_only
        self._gen = sampler.iter_node_ids()

    def collect(self):
        id_sets = [next(self._gen) for _ in range(self.spr)]
        from gist_tpu.sampler import bucket_size
        node_pad = max(bucket_size(len(ids)) for ids in id_sets)
        # extract each subgraph once, size the shared edge bucket, then
        # build numpy batches (stacked host-side -> one H2D per round)
        edges = [self.sampler.csr_subgraph(ids) for ids in id_sets]
        edge_pad = max(bucket_size(max(len(s), 1)) for s, _ in edges)
        return [self.sampler.make_batch(ids, node_pad=node_pad,
                                        edge_pad=edge_pad, edges=e,
                                        numpy=True, ids_only=self.ids_only)
                for ids, e in zip(id_sets, edges)]


def train_ist_cluster(
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
    checkpoint_dir: Optional[str] = None,
    lsgd: bool = False,
    verbose: bool = True,
) -> dict:
    """``lsgd=True`` runs the local-SGD baseline the reference's sweep
    references but never shipped (script/reddit/run_lsgd_sweep_reddit.py
    :63 points at a missing cluster_gcn_lsgd_distrib.py): no hidden
    splitting — every device trains the FULL model for iter_per_site
    steps and the sync averages all parameters (the all-leaves-unsplit
    special case of the IST merge)."""
    K = tc.num_subnet
    if normalize:
        ds.normalize_features()
    mesh = mesh or make_subnet_mesh(K)
    # All model kinds consume the block-dense dedup layout since round
    # 4: the dedup attention kernel (multi-head batched, fused
    # scatter-free backward) measures 164 ms/step vs 639 ms on the v1
    # gather path at 2.3M edges (results/r4_gat_train_*.jsonl) — the
    # sampler builds it so `--spmm-backend auto` composes without
    # caller flags
    sampler = ClusterSampler(ds, psize, batch_size, use_pp=use_pp,
                             cache_dir=cache_dir, seed=tc.seed,
                             tile_mode="dedup")
    full_graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    fx = jnp.asarray(ds.features)
    flabels = jnp.asarray(ds.labels)
    val_mask = jnp.asarray(ds.val_mask)
    test_mask = jnp.asarray(ds.test_mask)

    full_params = model.init(jax.random.PRNGKey(tc.seed), model_cfg)
    if lsgd:
        # no boundary is split: dispatch copies the full model, merge
        # averages every leaf over the K workers
        sub_cfg = model_cfg
        n_weight_layers = len(full_params["layers"])
        sizes = [None] * (n_weight_layers + 1)
    elif kind == "gat":
        # GAT-IST: hidden boundaries only, shared last attn
        # (ist_distrib_gat.py:88-94)
        sub_cfg = model_cfg.sub_config(num_subnet=K)
        sizes = [None] + [model_cfg.n_hidden] * (model_cfg.n_layers - 1) \
            + [None]
    else:
        sub_cfg = model_cfg.sub_config(split_input=False, split_output=True,
                                       num_subnet=K)
        sizes = boundary_sizes(model_cfg.in_feats, model_cfg.n_hidden,
                               model_cfg.n_layers, split_input=False,
                               split_output=True)
    round_fn = build_ist_round(model, sub_cfg, mesh=mesh, kind=kind,
                               num_subnet=K, weight_decay=tc.weight_decay,
                               split_input=False,
                               per_subnet_batches=lsgd)

    @jax.jit
    def infer_full(params):
        return model.apply(params, full_graph, fx, model_cfg)

    def evaluate(params):
        logits = infer_full(params)
        if use_f1:
            l = np.asarray(logits)
            return (micro_f1(l, ds.labels, ds.val_mask),
                    micro_f1(l, ds.labels, ds.test_mask))
        return (float(masked_accuracy(logits, flabels, val_mask)),
                float(masked_accuracy(logits, flabels, test_mask)))

    # local epochs: n_epochs // num_subnet (ist_distrib.py:385)
    local_epochs = max(tc.n_epochs // K, 1)
    steps_total = local_epochs * len(sampler)
    n_rounds = max(steps_total // tc.iter_per_site, 1)
    # lsgd: one flat collection of K*iter_per_site batches per round (a
    # common padding bucket), split into one stream per worker
    collector = _RoundCollector(
        sampler, tc.iter_per_site * K if lsgd else tc.iter_per_site,
        ids_only=True)
    tables = sampler.tables()

    part_key = jax.random.PRNGKey(tc.seed + 1)
    drop_key = jax.random.PRNGKey(tc.dropout_seed)
    total_time = 0.0
    total_edges = 0
    val_accs, test_accs, losses, eval_times = [], [], [], []
    steps_per_eval = max(len(sampler), 1)
    steps_done = 0
    next_eval = steps_per_eval
    start_round = 0

    if checkpoint_dir:
        from gist_tpu.train.checkpoint import (latest_round_dir,
                                               load_checkpoint,
                                               save_checkpoint)
        ck = latest_round_dir(checkpoint_dir)
        if ck is not None:
            state = load_checkpoint(ck)
            full_params = state["params"]
            part_key = jnp.asarray(state["part_key"])
            drop_key = jnp.asarray(state["drop_key"])
            start_round = int(state["round"]) + 1
            if verbose:
                print(f"resumed from {ck} (round {start_round})",
                      flush=True)
            # replay the sampler's RNG so cluster order continues
            for _ in range(start_round):
                collector.collect()

    if start_round >= n_rounds:
        # fully-trained checkpoint: just evaluate it
        va, ta = evaluate(full_params)
        val_accs.append(va)
        test_accs.append(ta)
        eval_times.append(0.0)
        losses.append(float("nan"))

    # overlap next round's host-side batch building with device compute
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=1)
    pending = pool.submit(collector.collect) if start_round < n_rounds \
        else None

    for rnd in range(start_round, n_rounds):
        batches = pending.result()
        pending = pool.submit(collector.collect) \
            if rnd + 1 < n_rounds else None
        if lsgd:
            # each worker consumes its own slice of the cluster stream;
            # unify tile buckets globally BEFORE slicing (per-slice
            # unification would still mismatch at the outer stack)
            from gist_tpu.sampler import unify_tile_buckets
            batches = unify_tile_buckets(batches)
            spr = tc.iter_per_site
            all_stacks = [_stack_batches(batches[i * spr:(i + 1) * spr])
                          for i in range(K)]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *all_stacks)
        else:
            stacked = _stack_batches(batches)
        part_key, sk = jax.random.split(part_key)
        bnds = sample_boundaries(sk, sizes, K)
        lr = reference_lr_schedule(tc.lr, n_rounds, rnd) if tc.lr_schedule \
            else tc.lr
        drop_key, dk = jax.random.split(drop_key)
        t0 = time.time()
        full_params, rl = round_fn(full_params, bnds, stacked,
                                   jnp.asarray(lr), dk, tables)
        jax.block_until_ready(full_params)
        total_time += time.time() - t0
        total_edges += sum(b.n_real_edges for b in batches) * K
        steps_done += tc.iter_per_site
        losses.append(float(jnp.mean(rl)))
        if steps_done >= next_eval or rnd == n_rounds - 1:
            next_eval += steps_per_eval
            va, ta = evaluate(full_params)
            val_accs.append(va)
            test_accs.append(ta)
            eval_times.append(total_time)   # time-to-accuracy curve
            if verbose:
                print(f"round {rnd}/{n_rounds}: loss {losses[-1]:.4f} "
                      f"val {va:.4f}", flush=True)
            if checkpoint_dir:
                import os
                save_checkpoint(
                    os.path.join(checkpoint_dir, f"round_{rnd}"),
                    {"params": full_params, "round": rnd,
                     "part_key": np.asarray(part_key),
                     "drop_key": np.asarray(drop_key)})

    results = {
        "dataset": ds.name, "num_subnet": K, "train_time": total_time,
        "edges_per_sec": total_edges / total_time if total_time else 0.0,
        "last_val": val_accs[-1], "best_val": max(val_accs),
        "last_test": test_accs[-1], "best_test": max(test_accs),
        "val_accs": val_accs, "test_accs": test_accs, "losses": losses,
        "eval_times": eval_times,
    }
    if verbose:
        print(f"Training Time: {total_time:.4f}", flush=True)
        print(f"Last Val: {val_accs[-1]:.4f}", flush=True)
        print(f"Best Val: {max(val_accs):.4f}", flush=True)
        print(f"Last Test: {test_accs[-1]:.4f}", flush=True)
        print(f"Best Test: {max(test_accs):.4f}", flush=True)
    return results
