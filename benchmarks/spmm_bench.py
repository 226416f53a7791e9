"""SpMM aggregation benchmark — reproduces the PERF.md table.

    python benchmarks/spmm_bench.py [--dataset synth-reddit-small]
        [--backends pallas,segment] [--dtype float32|bfloat16]
        [--grad] [--iters 10]

Prints one JSON line per measurement.
"""

import argparse
import json
import time


def measure(fn, x, iters):
    import jax
    fn(x).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        r = fn(x)
    r.block_until_ready()
    return (time.time() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synth-reddit-small")
    p.add_argument("--backends", default="pallas,segment")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--grad", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gist_tpu.data import load_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.ops.spmm import spmm_segment
    from gist_tpu.ops.pallas_spmm import spmm_pallas_csr

    backends = args.backends.split(",")
    ds = load_dataset(args.dataset)
    g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes,
                         tiles="pallas" in backends)
    x = jnp.asarray(ds.features).astype(jnp.dtype(args.dtype))
    E, F = g.n_edges, x.shape[1]

    fns = {}
    if "segment" in backends:
        fns["segment"] = jax.jit(lambda x: spmm_segment(g, x))
    if "pallas" in backends:
        fns["pallas"] = jax.jit(lambda x: spmm_pallas_csr(g, x))

    for name, fn in fns.items():
        dt = measure(fn, x, args.iters)
        print(json.dumps({
            "op": "spmm_fwd", "backend": name, "dtype": args.dtype,
            "dataset": args.dataset, "E": E, "F": F, "ms": round(dt * 1e3, 3),
            "edges_per_sec": round(E / dt, 1)}), flush=True)
        if args.grad:
            gfn = jax.jit(jax.grad(lambda x: jnp.sum(fn(x) ** 2)))
            dt = measure(gfn, x, args.iters)
            print(json.dumps({
                "op": "spmm_fwd_bwd", "backend": name, "dtype": args.dtype,
                "dataset": args.dataset, "E": E, "F": F,
                "ms": round(dt * 1e3, 3),
                "edges_per_sec": round(E / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
