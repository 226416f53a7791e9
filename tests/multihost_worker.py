"""Worker process for tests/test_multihost.py — NOT a test module.

Each of two worker processes owns 2 virtual CPU devices and joins a
4-device global mesh via ``init_multihost`` (the real jax.distributed
branch, replacing the reference's --rank/--dist-url plumbing,
ist_distrib.py:540-584).  It then runs ONE distributed IST round with
the same ``build_ist_round`` program the single-host trainers jit —
the multi-host claim in gist_tpu/multihost.py is exactly that this
code runs unchanged when the mesh spans processes.

Usage: python multihost_worker.py <coordinator> <process_id> <out.npz>
"""

import os
import sys


def main():
    coordinator, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    # this session's TPU plugin ignores JAX_PLATFORMS; force through config
    jax.config.update("jax_platforms", "cpu")

    from gist_tpu.multihost import init_multihost

    assert init_multihost(coordinator, 2, pid), "real branch not taken"
    assert jax.process_count() == 2
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    import jax.numpy as jnp
    import numpy as np

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.ist.distributed import build_ist_round, make_subnet_mesh
    from gist_tpu.ist.partition import boundary_sizes, sample_boundaries

    from gist_tpu.models import sage

    K, spr = 4, 2
    ds = synthetic_dataset("synth-tiny")
    graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    cfg = sage.SAGEConfig(ds.in_feats, 4 * K, ds.n_classes, n_layers=2)
    sub_cfg = cfg.sub_config(split_input=False, split_output=True,
                             num_subnet=K)
    full = sage.init(jax.random.PRNGKey(0), cfg)
    sizes = boundary_sizes(cfg.in_feats, cfg.n_hidden, cfg.n_layers,
                           split_input=False, split_output=True)
    bnds = sample_boundaries(jax.random.PRNGKey(1), sizes, K)
    mesh = make_subnet_mesh(K)  # spans both processes
    round_fn = build_ist_round(sage, sub_cfg, mesh=mesh, kind="sage",
                               num_subnet=K, weight_decay=5e-4,
                               split_input=False)
    x = jnp.asarray(ds.features)
    batches = (
        jax.tree.map(lambda a: jnp.broadcast_to(a, (spr,) + a.shape),
                     graph),
        jnp.broadcast_to(x, (spr,) + x.shape),
        jnp.broadcast_to(jnp.asarray(ds.labels),
                         (spr, ds.n_nodes)),
        jnp.broadcast_to(jnp.asarray(ds.train_mask),
                         (spr, ds.n_nodes)),
    )
    new_params, losses = round_fn(full, bnds, batches, jnp.asarray(1e-2),
                                  jax.random.PRNGKey(2), None)
    # new_params is replicated (P()) -> fully addressable everywhere;
    # losses are subnet-sharded -> only touch the local shards
    jax.block_until_ready(new_params)
    local_losses = np.concatenate(
        [np.asarray(s.data).ravel() for s in losses.addressable_shards])
    assert np.isfinite(local_losses).all()
    flat, _ = jax.tree.flatten(new_params)
    np.savez(out_path, *[np.asarray(a) for a in flat],
             losses=local_losses)
    print(f"proc {pid}: multihost IST round ok", flush=True)


if __name__ == "__main__":
    main()
