"""Multi-chip IST over a ``subnet`` mesh axis — the TPU-native
re-design of DistributedGNNWrapper (cluster_gcn_ist_distrib.py:68-367).

Reference topology: rank 0 holds the full model; every dispatch/sync
does O(n_layers x num_subnet) pairwise NCCL broadcasts through freshly
created-and-destroyed 2-rank groups (ist_distrib.py:21-28, 231-281),
serialized through the parameter server.

TPU-native topology: NO parameter server.  The full-width params are
replicated across the mesh; a shared PRNG key makes every device sample
the *same* partition locally (zero communication); each device slices
its own shard (:func:`gist_tpu.ist.dispatch` with its axis index) and
trains ``iter_per_site`` local steps under ``lax.scan``; sync is ONE
``all_gather`` over the subnet axis followed by a local scatter-merge —
a single fused collective per round riding ICI, instead of the
reference's broadcast storm.

An entire IST round (dispatch → local steps → sync) is one jitted
``shard_map`` program, so XLA overlaps the gather with the tail of the
backward pass where possible.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gist_tpu.ist.partition import boundary_sizes, sample_boundaries
from gist_tpu.ist.slicing import dispatch, merge
from gist_tpu.models.common import masked_cross_entropy
from gist_tpu.train.common import make_optimizer


def make_subnet_mesh(num_subnet: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < num_subnet:
        raise ValueError(
            f"need {num_subnet} devices for {num_subnet} subnets, "
            f"have {len(devices)}")
    return Mesh(np.asarray(devices[:num_subnet]), ("subnet",))


def build_ist_round(
    model,
    sub_cfg,
    *,
    mesh: Mesh,
    kind: str,
    num_subnet: int,
    weight_decay: float,
    split_input: bool,
    sync: bool = True,
    per_subnet_batches: bool = False,
) -> Callable:
    """Build the jitted one-round function:

        full_params, losses = round_fn(full_params, bnds, batches, lr,
                                       key, tables)

    ``batches`` is a pytree with a leading (n_steps,) scan axis,
    replicated to every subnet (the reference gives every rank an
    identically-seeded cluster stream — run_ist_sweep_reddit.py:68):
    either inline (graph, feats, labels, mask) tuples or ids-form
    (graph, node_ids) tuples paired with ``tables`` =
    ``ClusterSampler.tables()`` (pass tables=None for inline).
    ``lr`` is a scalar; a fresh Adam state is created inside the round
    (fresh-optimizer-per-dispatch semantics, ist_distrib.py:400-407).
    """
    opt = optax.inject_hyperparams(make_optimizer,
                                   static_args=("weight_decay",))(
        lr=1e-2, weight_decay=weight_decay)

    def local_step(graph, sub, opt_state, feats, labels, mask, key):
        def loss_fn(p):
            logits = model.apply(p, graph, feats, sub_cfg, train=True,
                                 dropout_key=key)
            return masked_cross_entropy(logits, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(sub)
        updates, opt_state = opt.update(grads, opt_state, sub)
        sub = optax.apply_updates(sub, updates)
        return sub, opt_state, loss

    batch_spec = P("subnet") if per_subnet_batches else P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), batch_spec, P(), P(), P()),
             out_specs=(P(), P("subnet")),
             check_vma=False)
    def round_fn(full_params, bnds, batches, lr, key, tables):
        if per_subnet_batches:
            # leading (1,) local slice of the per-subnet batch stack
            batches = jax.tree.map(lambda a: a[0], batches)
        s = jax.lax.axis_index("subnet")
        sub = dispatch(full_params, bnds, s, kind)
        opt_state = opt.init(sub)
        opt_state.hyperparams["lr"] = lr
        key = jax.random.fold_in(key, s)

        def body(carry, batch):
            sub, opt_state, key = carry
            key, dk = jax.random.split(key)
            from gist_tpu.sampler import ClusterSampler
            graph, feats, labels, mask = ClusterSampler.resolve_batch(
                batch, tables)
            if split_input and bnds[0] is not None:
                feats = jnp.take(feats, bnds[0][s], axis=1)
            sub, opt_state, loss = local_step(
                graph, sub, opt_state, feats, labels, mask, dk)
            return (sub, opt_state, key), loss

        (sub, _, _), losses = jax.lax.scan(body, (sub, opt_state, key),
                                           batches)
        if sync:
            stacked = jax.lax.all_gather(sub, "subnet")
            full_params = merge(full_params, bnds, stacked, num_subnet, kind)
        return full_params, losses[None]

    return jax.jit(round_fn)


def run_distributed_ist(
    ds,
    model_cfg,
    tc,
    *,
    model,
    kind: str = "gcn",
    mesh: Optional[Mesh] = None,
    n_rounds: Optional[int] = None,
    steps_per_round: Optional[int] = None,
    verbose: bool = True,
):
    """Full-graph distributed IST training (small-graph regime): each
    local step uses the whole graph, mirroring train_ist.py but with the
    K subnets on K devices instead of a sequential loop."""
    import time

    from gist_tpu.graph import graph_from_edges
    from gist_tpu.models.common import masked_accuracy
    from gist_tpu.train.common import reference_lr_schedule

    K = tc.num_subnet
    mesh = mesh or make_subnet_mesh(K)
    graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    train_mask = jnp.asarray(ds.train_mask)
    val_mask = jnp.asarray(ds.val_mask)
    test_mask = jnp.asarray(ds.test_mask)

    full_params = model.init(jax.random.PRNGKey(tc.seed), model_cfg)
    sub_cfg = model_cfg.sub_config(split_input=tc.split_input,
                                   split_output=tc.split_output,
                                   num_subnet=K)
    sizes = boundary_sizes(model_cfg.in_feats, model_cfg.n_hidden,
                           model_cfg.n_layers, split_input=tc.split_input,
                           split_output=tc.split_output)
    round_fn = build_ist_round(
        model, sub_cfg, mesh=mesh, kind=kind, num_subnet=K,
        weight_decay=tc.weight_decay, split_input=tc.split_input)

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, graph, x, model_cfg)
        return (masked_accuracy(logits, labels, val_mask),
                masked_accuracy(logits, labels, test_mask))

    spr = steps_per_round or tc.iter_per_site
    n_rounds = n_rounds or max(tc.n_epochs // spr, 1)
    # one shared "batch" repeated per local step (full-graph training)
    batches = (
        jax.tree.map(lambda a: jnp.broadcast_to(a, (spr,) + a.shape), graph),
        jnp.broadcast_to(x, (spr,) + x.shape),
        jnp.broadcast_to(labels, (spr,) + labels.shape),
        jnp.broadcast_to(train_mask, (spr,) + train_mask.shape),
    )

    part_key = jax.random.PRNGKey(tc.seed + 1)
    drop_key = jax.random.PRNGKey(tc.dropout_seed)
    val_accs, test_accs, losses = [], [], []
    t0 = time.time()
    for rnd in range(n_rounds):
        part_key, sk = jax.random.split(part_key)
        bnds = sample_boundaries(sk, sizes, K)
        lr = reference_lr_schedule(tc.lr, n_rounds * spr, rnd * spr)
        drop_key, dk = jax.random.split(drop_key)
        full_params, rl = round_fn(full_params, bnds, batches,
                                   jnp.asarray(lr), dk, None)
        va, ta = evaluate(full_params)
        val_accs.append(float(va))
        test_accs.append(float(ta))
        losses.append(float(jnp.mean(rl)))
        if verbose:
            print(f"round {rnd}: loss {losses[-1]:.4f} val {va:.4f}",
                  flush=True)
    total = time.time() - t0

    return {
        "dataset": ds.name, "num_subnet": K, "train_time": total,
        "final_test_acc": test_accs[-1], "best_val_acc": max(val_accs),
        "best_test_acc": max(test_accs), "val_accs": val_accs,
        "test_accs": test_accs, "losses": losses,
    }
