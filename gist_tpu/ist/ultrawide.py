"""Ultra-wide IST: host-RAM-resident global params, device-resident
sub-models — the cluster_gcn_ist_ultra_wide.py regime, TPU-native.

Reference mechanics (ultra_wide.py:78-86, 143-204): rank 0 keeps the
full-width model on CPU ("the whole point is to train a global model
too wide for device memory") and every dispatch/sync stages each shard
slice → GPU → NCCL → CPU, serially per (layer, site).

Here the full-width params are plain numpy arrays in host RAM — bounded
only by host memory, the same scaling story.  Dispatch slices each
subnet's shard with numpy fancy indexing and `device_put`s the stacked
shards directly onto the subnet mesh (sharded on the leading subnet
axis, so each device receives only its own 1/K slice — one H2D transfer
per sync instead of the reference's per-layer-per-site staging).  Local
training runs the same jitted shard_map scan as the on-device engine;
after the burst, shards come back D2H once and merge in numpy.

Evaluation of the full-width model runs on the CPU backend (the
reference's --eval-cpu path, cluster_gcn.py:110-127), since by
construction the full model may not fit one chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gist_tpu.models.common import masked_cross_entropy
from gist_tpu.train.common import make_optimizer

Boundaries = list  # per boundary: np.ndarray (K, chunk) or None


# ---------------------------------------------------------------------------
# Host-side (numpy) partition sampling / slicing / merging
# ---------------------------------------------------------------------------

from gist_tpu.ist.partition import VIRTUAL_IDX


def sample_boundaries_host(rng: np.random.Generator, sizes, num_subnet):
    """Non-divisible sizes pad to equal ceil width with VIRTUAL_IDX
    entries (zero rows at dispatch, dropped at merge) — the host-numpy
    mirror of ist.partition.sample_partition."""
    out = []
    for size in sizes:
        if size is None:
            out.append(None)
        else:
            c = -(-size // num_subnet)
            perm = rng.permutation(num_subnet * c).astype(np.int64)
            if num_subnet * c != size:
                perm = np.where(perm < size, perm, VIRTUAL_IDX)
            out.append(perm.reshape(num_subnet, c))
    return out


def _full_idx_np(idx, half):
    return np.concatenate([idx, idx + half])


def _gather_np(a, idx, axis):
    """np.take with VIRTUAL_IDX entries reading zero (numpy has no
    fill mode and would raise on the out-of-range padding ids)."""
    n = a.shape[axis]
    valid = idx < n
    out = np.take(a, np.minimum(idx, n - 1), axis=axis)
    if not valid.all():
        sl = [slice(None)] * a.ndim
        sl[axis] = ~valid
        out[tuple(sl)] = 0
    return out


def dispatch_host(params: dict, bnds: Boundaries, num_subnet: int,
                  kind: str = "sage") -> dict:
    """Numpy slice of every subnet's shard, stacked on axis 0."""
    layers_out = []
    for i, layer in enumerate(params["layers"]):
        b_in = bnds[i]
        b_out = bnds[i + 1] if i + 1 < len(bnds) else None
        ws, bs, attns = [], [], []
        for s in range(num_subnet):
            if kind in ("gcn", "sage"):
                w = layer["w"]
                if b_in is not None:
                    rows = (_full_idx_np(b_in[s], w.shape[0] // 2)
                            if kind == "sage" else b_in[s])
                    w = _gather_np(w, rows, axis=0)
                if b_out is not None:
                    w = _gather_np(w, b_out[s], axis=1)
                ws.append(w)
                b = layer["b"]
                bs.append(_gather_np(b, b_out[s], axis=0)
                          if b_out is not None else b)
            elif kind == "gat":
                w, attn = layer["w"], layer["attn"]
                if b_in is not None:
                    w = _gather_np(w, b_in[s], axis=1)
                if b_out is not None:
                    w = _gather_np(w, b_out[s], axis=2)
                    attn = _gather_np(
                        attn, _full_idx_np(b_out[s], attn.shape[1] // 2),
                        axis=1)
                ws.append(w)
                attns.append(attn)
            else:
                raise ValueError(kind)
        if kind == "gat":
            layers_out.append({"w": np.stack(ws), "attn": np.stack(attns)})
        else:
            layers_out.append({"w": np.stack(ws), "b": np.stack(bs)})
    return {"layers": layers_out}


def merge_host(params: dict, bnds: Boundaries, stacked: dict,
               num_subnet: int, kind: str = "sage") -> dict:
    """In-place numpy scatter/average — train_ist.py:244-286 semantics."""
    for i, layer in enumerate(params["layers"]):
        b_in = bnds[i]
        b_out = bnds[i + 1] if i + 1 < len(bnds) else None
        sub = stacked["layers"][i]
        if kind in ("gcn", "sage"):
            w, b = layer["w"], layer["b"]
            if b_in is None and b_out is None:
                w[...] = sub["w"].mean(axis=0)
            else:
                for s in range(num_subnet):
                    rows = None if b_in is None else (
                        _full_idx_np(b_in[s], w.shape[0] // 2)
                        if kind == "sage" else b_in[s])
                    # vr/vc drop VIRTUAL_IDX padding (non-divisible dims)
                    vr = None if rows is None else rows < w.shape[0]
                    vc = None if b_out is None else b_out[s] < w.shape[1]
                    if rows is not None and b_out is not None:
                        w[np.ix_(rows[vr], b_out[s][vc])] = \
                            sub["w"][s][np.ix_(vr, vc)]
                    elif rows is not None:
                        w[rows[vr], :] = sub["w"][s][vr]
                    else:
                        w[:, b_out[s][vc]] = sub["w"][s][:, vc]
            if b_out is None:
                b[...] = sub["b"].mean(axis=0)
            else:
                for s in range(num_subnet):
                    vc = b_out[s] < b.shape[0]
                    b[b_out[s][vc]] = sub["b"][s][vc]
        elif kind == "gat":
            w, attn = layer["w"], layer["attn"]
            if b_in is None and b_out is None:
                w[...] = sub["w"].mean(axis=0)
            else:
                for s in range(num_subnet):
                    vr = None if b_in is None else b_in[s] < w.shape[1]
                    vc = None if b_out is None else b_out[s] < w.shape[2]
                    if b_in is not None and b_out is not None:
                        w[:, b_in[s][vr][:, None], b_out[s][vc][None, :]] = \
                            sub["w"][s][:, vr][:, :, vc]
                    elif b_in is not None:
                        w[:, b_in[s][vr], :] = sub["w"][s][:, vr]
                    else:
                        w[:, :, b_out[s][vc]] = sub["w"][s][:, :, vc]
            if b_out is None:
                attn[...] = sub["attn"].mean(axis=0)
            else:
                half = attn.shape[1] // 2
                for s in range(num_subnet):
                    fi = _full_idx_np(b_out[s], half)
                    vi = fi < attn.shape[1]
                    attn[:, fi[vi]] = sub["attn"][s][:, vi]
        else:
            raise ValueError(kind)
    return params


# ---------------------------------------------------------------------------
# Device-side local training (no dispatch/merge inside — shards arrive
# pre-sliced, sharded over the subnet axis)
# ---------------------------------------------------------------------------

def build_local_burst(model, sub_cfg, *, mesh: Mesh, weight_decay: float):
    """jitted: (stacked_subs sharded over 'subnet', batches, lr, key,
    tables) -> (trained stacked_subs, losses).  ``batches``/``tables``
    as in build_ist_round: inline 4-tuples with tables=None, or
    ids-form 2-tuples with ``ClusterSampler.tables()``."""
    opt = optax.inject_hyperparams(make_optimizer,
                                   static_args=("weight_decay",))(
        lr=1e-2, weight_decay=weight_decay)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("subnet"), P(), P(), P(), P()),
             out_specs=(P("subnet"), P("subnet")),
             check_vma=False)
    def burst(stacked, batches, lr, key, tables):
        sub = jax.tree.map(lambda a: a[0], stacked)   # local (1, ...) -> (...)
        s = jax.lax.axis_index("subnet")
        key = jax.random.fold_in(key, s)
        opt_state = opt.init(sub)
        opt_state.hyperparams["lr"] = lr

        def body(carry, batch):
            sub, opt_state, key = carry
            key, dk = jax.random.split(key)
            from gist_tpu.sampler import ClusterSampler
            graph, feats, labels, mask = ClusterSampler.resolve_batch(
                batch, tables)

            def loss_fn(p):
                logits = model.apply(p, graph, feats, sub_cfg, train=True,
                                     dropout_key=dk)
                return masked_cross_entropy(logits, labels, mask)

            loss, grads = jax.value_and_grad(loss_fn)(sub)
            updates, opt_state = opt.update(grads, opt_state, sub)
            sub = optax.apply_updates(sub, updates)
            return (sub, opt_state, key), loss

        (sub, _, _), losses = jax.lax.scan(body, (sub, opt_state, key),
                                           batches)
        return jax.tree.map(lambda a: a[None], sub), losses[None]

    return jax.jit(burst)


def build_local_burst_single(model, sub_cfg, *, weight_decay: float):
    """Single-device variant of :func:`build_local_burst` for running K
    subnets SEQUENTIALLY on one chip — the ultra-wide analog of the
    reference's single-process simulation loop (train_ist.py:209-225),
    here with host-resident full-width globals (ultra_wide.py:78-86).

    jitted: (sub UNstacked, batches, lr, key, subnet_id, tables) ->
    (trained sub, losses).  ``subnet_id`` is a traced scalar so ONE
    compilation serves all K subnets; the key fold matches the
    shard_map path's ``fold_in(key, axis_index('subnet'))`` exactly, so
    sequential and mesh execution produce the same trained shards."""
    opt = optax.inject_hyperparams(make_optimizer,
                                   static_args=("weight_decay",))(
        lr=1e-2, weight_decay=weight_decay)

    def burst(sub, batches, lr, key, subnet_id, tables):
        key = jax.random.fold_in(key, subnet_id)
        opt_state = opt.init(sub)
        opt_state.hyperparams["lr"] = lr

        def body(carry, batch):
            sub, opt_state, key = carry
            key, dk = jax.random.split(key)
            from gist_tpu.sampler import ClusterSampler
            graph, feats, labels, mask = ClusterSampler.resolve_batch(
                batch, tables)

            def loss_fn(p):
                logits = model.apply(p, graph, feats, sub_cfg, train=True,
                                     dropout_key=dk)
                return masked_cross_entropy(logits, labels, mask)

            loss, grads = jax.value_and_grad(loss_fn)(sub)
            updates, opt_state = opt.update(grads, opt_state, sub)
            sub = optax.apply_updates(sub, updates)
            return (sub, opt_state, key), loss

        (sub, _, _), losses = jax.lax.scan(body, (sub, opt_state, key),
                                           batches)
        return sub, losses

    return jax.jit(burst)


def shard_over_subnets(mesh: Mesh, stacked_np: dict):
    """device_put the host-stacked shards so each device holds only its
    own subnet's slice (leading axis sharded over the mesh)."""
    def put(a):
        spec = P("subnet", *([None] * (a.ndim - 1)))
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked_np)
