"""IST x graph sharding on a 2-D device mesh ("subnet", "graph").

The two scaling axes of the framework composed — hidden width across
the ``subnet`` axis (GIST's independent sub-networks) and graph size
across the ``graph`` axis (edge partitioning + halo all_to_all):

* full-width params are replicated everywhere;
* every device derives the round's partition from the shared key,
  slices the sub-model for its subnet row (``axis_index("subnet")``);
* each local step runs the graph-sharded SAGE forward over its graph
  column (halo exchange + psum over ``graph`` only);
* gradients psum over ``graph`` (data-parallel within a subnet);
* sync = ONE all_gather over ``subnet`` + local merge.

With S subnets and G graph shards this runs on S*G chips; the
reference's ceiling was "K processes each holding the whole graph".
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gist_tpu.ist.slicing import dispatch, merge
from gist_tpu.parallel.graph_shard import ShardedGraph
# the sub-model forward is the shared graph-sharded stack of the
# requested family (sage | gcn | gat), via parallel/train._forward
from gist_tpu.parallel.train import _forward, device_arrays
from gist_tpu.train.common import make_optimizer


def make_ist_graph_mesh(num_subnet: int, num_graph: int,
                        devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = num_subnet * num_graph
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(num_subnet, num_graph)
    return Mesh(arr, ("subnet", "graph"))


def build_ist_sharded_round(
    sg: ShardedGraph,
    mesh: Mesh,
    *,
    num_subnet: int,
    kind: str = "sage",
    weight_decay: float = 0.0,
    use_layernorm: bool = True,
    n_steps: int = 1,
    halo_dtype=None,
):
    """Jitted full round over the 2-D mesh:

        full_params, losses = round_fn(full_params, bnds, x_sh,
                                       labels_sh, mask_sh, lr, key)

    ``x_sh``/``labels_sh``/``mask_sh`` are graph-sharded (leading dim
    D_graph * n_loc_pad, sharded over "graph", replicated over
    "subnet").  A fresh Adam runs ``n_steps`` local full-graph steps
    per round (the iter_per_site burst).
    """
    opt = make_optimizer(1.0, weight_decay)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P("graph", None), P("graph"), P("graph"),
                       P(), P(), P("graph")),
             out_specs=(P(), P()),
             check_vma=False)
    def round_fn(full_params, bnds, x_loc, labels_loc, mask_loc, lr, key,
                 dev):
        dev = jax.tree.map(lambda a: a[0], dev)
        s = jax.lax.axis_index("subnet")
        sub = dispatch(full_params, bnds, s, kind)
        opt_state = opt.init(sub)
        key = jax.random.fold_in(key, s)

        def loss_fn(p):
            logits = _forward(kind, sg, p, x_loc, dev,
                              use_layernorm=use_layernorm,
                              halo_dtype=halo_dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels_loc[:, None],
                                       axis=-1)[:, 0]
            m = mask_loc.astype(logits.dtype)
            num = jax.lax.psum(jnp.sum(nll * m), "graph")
            den = jax.lax.psum(jnp.sum(m), "graph")
            return num / jnp.maximum(den, 1.0)

        def step(carry, _):
            sub, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(sub)
            grads = jax.lax.psum(grads, "graph")
            updates, opt_state = opt.update(grads, opt_state, sub)
            updates = jax.tree.map(lambda u: u * lr, updates)
            sub = optax.apply_updates(sub, updates)
            return (sub, opt_state), loss

        (sub, _), losses = jax.lax.scan(step, (sub, opt_state), None,
                                        length=n_steps)
        stacked = jax.lax.all_gather(sub, "subnet")
        full_params = merge(full_params, bnds, stacked, num_subnet, kind)
        return full_params, losses[None]

    def run(full_params, bnds, x_sh, labels_sh, mask_sh, lr, key):
        return round_fn(full_params, bnds, x_sh, labels_sh, mask_sh, lr,
                        key, device_arrays(sg))

    return jax.jit(run)
