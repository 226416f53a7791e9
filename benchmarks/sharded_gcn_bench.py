"""Sharded-GCN forward cost on the real chip at D=1 (VERDICT r4 weak
#4): SAGE has the r3 D=1 chip record (r3_sharded_agg.json) and GAT's
hybrid partial-softmax was chip-verified in round 4, but the sharded
GCN forward (halo'd symmetric-norm aggregation + whole-tensor LayerNorm
via psum, parallel/train.py:75-117) had only CPU-mesh/test evidence.

Measures, on the one real chip (D=1 mesh — no halo, interior == all
edges, so this isolates the sharding plumbing + psum-LN overhead):

  * the flat models/gcn forward (2 layers, hidden 128, self-loops like
    the reference gcn/train.py:64-70),
  * the sharded D=1 GCN forward with interior Pallas dedup tiles,

with a correctness cross-check (rel err of sharded vs flat logits).
The device-array bundle rides the jit as a RUNTIME ARGUMENT (baked
ShardedGraph constants exceed the remote-compile body limit).

Usage: python benchmarks/sharded_gcn_bench.py
Writes results/r5_sharded_gcn_agg.json.
"""

import json
import os
import time
from functools import partial

import numpy as np

DATASET = os.environ.get("GCN_BENCH_DATASET", "synth-reddit-small")
ITERS = int(os.environ.get("GCN_BENCH_ITERS", "20"))
if os.environ.get("GCN_BENCH_CPU"):         # smoke mode
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1"
                               ).strip()


def main():
    import jax
    if os.environ.get("GCN_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.models import gcn
    from gist_tpu.parallel.graph_shard import (build_sharded_graph,
                                               shard_features, unshard)
    from gist_tpu.parallel.train import _forward, device_arrays
    from gist_tpu.utils import hardware_tag

    ds = synthetic_dataset(DATASET)
    # GCN trains with self-loops, like the reference (gcn/train.py:64-70)
    loops = np.arange(ds.n_nodes)
    s = np.concatenate([ds.senders, loops])
    r = np.concatenate([ds.receivers, loops])
    E, F = len(s), ds.features.shape[1]
    HID, LAYERS = 128, 2
    print(f"N={ds.n_nodes} E={E} F={F} hid={HID}", flush=True)

    cfg = gcn.GCNConfig(ds.in_feats, HID, ds.n_classes, n_layers=LAYERS,
                        dropout=0.0)
    params = gcn.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(ds.features)

    # flat comparator (forward-only tile layout keeps the compile
    # payload under the remote limit); CPU smoke mode skips the Pallas
    # layouts (interpret-only there)
    tiles = not os.environ.get("GCN_BENCH_CPU")
    g = graph_from_edges(s, r, ds.n_nodes, tiles=tiles)
    g_fwd = g.replace(dedup_t=None, tiled_t=None) if tiles else g

    @jax.jit
    def flat_loop(params, x):
        def body(i, acc):
            y = gcn.apply(params, g_fwd,
                          x + (i.astype(x.dtype) * jnp.asarray(1e-9)),
                          cfg)
            return acc + y[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.asarray(0.0))

    _ = float(flat_loop(params, x))          # compile + warm
    t0 = time.time()
    _ = float(flat_loop(params, x))
    flat_s = (time.time() - t0) / ITERS
    print(f"flat GCN fwd: {flat_s * 1e3:.2f} ms "
          f"({E / flat_s / 1e6:.0f}M edges/s)", flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    sg = build_sharded_graph(s, r, ds.n_nodes, 1, interior_tiles=tiles)
    xs = shard_features(sg, ds.features, mesh)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("graph", None), P("graph")),
             out_specs=P("graph", None), check_vma=False)
    def fwd(params, x_loc, dev):
        dev = jax.tree.map(lambda a: a[0], dev)
        return _forward("gcn", sg, params, x_loc, dev,
                        use_layernorm=True, halo_dtype=None)

    # correctness once
    got = np.asarray(unshard(sg, jax.jit(fwd)(
        params, xs, device_arrays(sg))))[:ds.n_nodes]
    want = np.asarray(jax.jit(
        lambda p, xv: gcn.apply(p, g_fwd, xv, cfg))(params, x))
    err = float(np.max(np.abs(got - want))
                / max(float(np.max(np.abs(want))), 1e-9))
    print(f"rel err vs flat: {err:.2e}", flush=True)

    @jax.jit
    def sharded_loop(params, xs, dev):
        def body(i, acc):
            y = fwd(params, xs + (i.astype(xs.dtype)
                                  * jnp.asarray(1e-9)), dev)
            return acc + y[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.asarray(0.0))

    dev = device_arrays(sg)
    _ = float(sharded_loop(params, xs, dev))   # compile + warm
    t0 = time.time()
    _ = float(sharded_loop(params, xs, dev))
    sh_s = (time.time() - t0) / ITERS
    print(f"sharded D=1 GCN fwd: {sh_s * 1e3:.2f} ms "
          f"({E / sh_s / 1e6:.0f}M edges/s), {sh_s / flat_s:.2f}x flat",
          flush=True)

    out = {
        "dataset": DATASET, "n_edges": E, "f": F,
        "hidden": HID, "n_layers": LAYERS,
        "hardware": hardware_tag(),
        "flat_fwd_ms": flat_s * 1e3,
        "sharded_d1_fwd_ms": sh_s * 1e3,
        "sharded_vs_flat": sh_s / flat_s,
        "sharded_rel_err": err,
        "edges_per_sec_flat": E / flat_s,
        "edges_per_sec_sharded_d1": E / sh_s,
        "note": ("D=1: no halo, interior == all edges; measures the "
                 "sharding plumbing + psum whole-tensor-LN overhead of "
                 "parallel/train.sharded_gcn_forward on the chip"),
    }
    with open("results/r5_sharded_gcn_agg.json", "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
