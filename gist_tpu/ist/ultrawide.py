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

def sample_boundaries_host(rng: np.random.Generator, sizes, num_subnet):
    out = []
    for size in sizes:
        if size is None:
            out.append(None)
        else:
            perm = rng.permutation(size).astype(np.int64)
            out.append(perm.reshape(num_subnet, size // num_subnet))
    return out


def _full_idx_np(idx, half):
    return np.concatenate([idx, idx + half])


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
                    w = w[rows, :]
                if b_out is not None:
                    w = w[:, b_out[s]]
                ws.append(w)
                b = layer["b"]
                bs.append(b[b_out[s]] if b_out is not None else b)
            elif kind == "gat":
                w, attn = layer["w"], layer["attn"]
                if b_in is not None:
                    w = w[:, b_in[s], :]
                if b_out is not None:
                    w = w[:, :, b_out[s]]
                    attn = attn[:, _full_idx_np(b_out[s],
                                                attn.shape[1] // 2)]
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
                    if rows is not None and b_out is not None:
                        w[np.ix_(rows, b_out[s])] = sub["w"][s]
                    elif rows is not None:
                        w[rows, :] = sub["w"][s]
                    else:
                        w[:, b_out[s]] = sub["w"][s]
            if b_out is None:
                b[...] = sub["b"].mean(axis=0)
            else:
                for s in range(num_subnet):
                    b[b_out[s]] = sub["b"][s]
        elif kind == "gat":
            w, attn = layer["w"], layer["attn"]
            if b_in is None and b_out is None:
                w[...] = sub["w"].mean(axis=0)
            else:
                for s in range(num_subnet):
                    if b_in is not None and b_out is not None:
                        w[:, b_in[s][:, None], b_out[s][None, :]] = sub["w"][s]
                    elif b_in is not None:
                        w[:, b_in[s], :] = sub["w"][s]
                    else:
                        w[:, :, b_out[s]] = sub["w"][s]
            if b_out is None:
                attn[...] = sub["attn"].mean(axis=0)
            else:
                half = attn.shape[1] // 2
                for s in range(num_subnet):
                    attn[:, _full_idx_np(b_out[s], half)] = sub["attn"][s]
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


def shard_over_subnets(mesh: Mesh, stacked_np: dict):
    """device_put the host-stacked shards so each device holds only its
    own subnet's slice (leading axis sharded over the mesh)."""
    def put(a):
        spec = P("subnet", *([None] * (a.ndim - 1)))
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked_np)
