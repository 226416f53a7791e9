"""Sharded-aggregation plumbing cost on the real chip (VERDICT r2 #2).

Round 2's graph-sharded path aggregated through XLA segment_sum — 10x
the kernel's end-to-end step time — so the projected multi-chip scaling
numbers were computed from a single-chip kernel time the sharded step
could not actually achieve.  Round 3 routes the interior edges through
the Pallas dedup kernel (parallel/graph_shard.py).  This benchmark
measures, on the one real chip (D=1 mesh — no halo, interior == all
edges):

  * the flat dedup kernel (the bench.py headline path),
  * the sharded ring aggregation with interior tiles (kernel path),
  * the sharded ring aggregation on the segment path (round-2 state),

and re-emits the D-chip scaling projection fed by the SHARDED step's
own measured time instead of the flat-kernel constant.

Usage: python benchmarks/sharded_step_bench.py
Writes results/r3_sharded_agg.json.
"""

import json
import time

import numpy as np


def loop_time(fn, x, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x + (i.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)))
            return acc + y[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, x.dtype))

    _ = float(run(x))  # compile + warm
    t0 = time.time()
    _ = float(run(x))
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.ops.pallas_spmm import spmm_pallas_csr
    from gist_tpu.parallel.graph_shard import (build_sharded_graph,
                                               shard_features,
                                               sharded_aggregate)
    from gist_tpu.utils import hardware_tag

    ds = synthetic_dataset("synth-reddit-small")
    E, F = len(ds.senders), ds.features.shape[1]
    print(f"N={ds.n_nodes} E={E} F={F}", flush=True)
    x = jnp.asarray(ds.features)

    # flat kernel reference (forward-only graph keeps compile payload
    # under the remote limit; graph as closure is fine for pallas since
    # spmm_pallas_csr takes it as an argument through jit below)
    g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes, tiles=True)
    g_fwd = g.replace(dedup_t=None, tiled_t=None)
    flat_s = loop_time(lambda xv: spmm_pallas_csr(g_fwd, xv), x, iters=20)
    print(f"flat dedup kernel: {flat_s * 1e3:.2f} ms "
          f"({E / flat_s / 1e6:.0f}M edges/s)", flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    results = {}
    for tiles in (True, False):
        sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, 1,
                                 interior_tiles=tiles)
        xs = shard_features(sg, ds.features, mesh)
        agg = sharded_aggregate(sg, mesh)
        # correctness vs the flat kernel once
        from gist_tpu.parallel.graph_shard import unshard
        got = np.asarray(unshard(sg, agg(xs)))[:ds.n_nodes]
        want = np.asarray(jax.jit(
            lambda xv: spmm_pallas_csr(g_fwd, xv))(x))
        err = float(np.max(np.abs(got - want))
                    / max(float(np.max(np.abs(want))), 1e-9))
        dt = loop_time(agg, xs, iters=20 if tiles else 5)
        tag = "kernel" if tiles else "segment"
        print(f"sharded D=1 ({tag}): {dt * 1e3:.2f} ms "
              f"({E / dt / 1e6:.0f}M edges/s), rel err {err:.2e}",
              flush=True)
        results[f"sharded_d1_{tag}_ms"] = dt * 1e3
        results[f"sharded_d1_{tag}_rel_err"] = err
        if tiles:
            sharded_s = dt

    # projection from the SHARDED step's measured time (not the flat
    # kernel constant — VERDICT r2 weak #6)
    projections = {}
    for d in (2, 4, 8):
        sgd = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d,
                                  interior_tiles=False)
        proj = sgd.projected_scaling(t1_agg_s=sharded_s, f=F)
        proj16 = sgd.projected_scaling(t1_agg_s=sharded_s, f=F,
                                       halo_itemsize=2)
        proj["efficiency_overlap_bf16_halo"] = (
            proj16["efficiency_overlap"])
        projections[f"d{d}"] = proj
        print(f"D={d}: efficiency {proj['efficiency_overlap']:.1%} "
              f"(overlap; {proj16['efficiency_overlap']:.1%} with "
              f"bf16 halos), edge balance {proj['edge_balance']:.2f}x",
              flush=True)

    out = {
        "dataset": "synth-reddit-small", "n_edges": E, "f": F,
        "hardware": hardware_tag(),
        "flat_kernel_ms": flat_s * 1e3,
        "flat_edges_per_sec": E / flat_s,
        "sharded_vs_flat": results["sharded_d1_kernel_ms"]
        / (flat_s * 1e3),
        **results,
        "projected_scaling_from_sharded_step": projections,
    }
    with open("results/r3_sharded_agg.json", "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}), flush=True)


if __name__ == "__main__":
    main()
