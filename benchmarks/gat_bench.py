"""GAT fused attention kernel benchmark vs the XLA segment composite.

    python benchmarks/gat_bench.py [--nodes 4096] [--edges 80000]
        [--dim 128] [--iters 20]
"""

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=4096)
    p.add_argument("--edges", type=int, default=80000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import gist_tpu.graph as G
    from gist_tpu.ops.pallas_gat import _xla_reference, gat_attention_pallas

    rng = np.random.default_rng(0)
    n, e, d = args.nodes, args.edges, args.dim
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    g = G.graph_from_edges(s, r, n, tiles=True)
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    for name, fn in [
        ("pallas", jax.jit(lambda: gat_attention_pallas(g, z, a, b, 0.01))),
        ("xla", jax.jit(lambda: _xla_reference(g, z, a, b, 0.01))),
    ]:
        fn().block_until_ready()
        t0 = time.time()
        for _ in range(args.iters):
            out = fn()
        out.block_until_ready()
        dt = (time.time() - t0) / args.iters
        print(json.dumps({
            "op": "gat_attention", "backend": name, "N": n, "E": e, "D": d,
            "ms": round(dt * 1e3, 3), "edges_per_sec": round(e / dt, 1)}),
            flush=True)


if __name__ == "__main__":
    main()
