"""Benchmark entry — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): edges/sec/chip for the SpMM aggregation on a
Reddit-shaped graph, using the Pallas gather+tiled-segment-reduce
kernel (gist_tpu/ops/pallas_spmm.py); falls back to the XLA segment
backend if the kernel can't compile.  ``vs_baseline`` is the fraction
of the speed-of-light bound (each edge must read one F-wide source row
from HBM once: E*F*4 bytes at ~810 GB/s), since the reference
publishes no numbers (BASELINE.md).

Measured context (v5e, E=2.33M, F=602): segment backend 70 ms
(scatter-bound), pallas kernel 22 ms = the full 3-pass HBM traffic of
the gather-then-reduce formulation.  Compile via this session's remote
tunnel is slow (~18 min cold) — the kernel itself is the product.
"""

import json
import os
import time

import numpy as np


def _measure(fn, x, iters=10):
    import jax
    fn(x).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        r = fn(x)
    r.block_until_ready()
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.ops.spmm import spmm_segment

    fast = os.environ.get("GIST_BENCH_FAST", "") == "1"
    ds = synthetic_dataset("synth-reddit-small")
    g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes,
                         tiles=not fast)
    x = jnp.asarray(ds.features)
    E, F = g.n_edges, ds.in_feats

    backend = "segment"
    dt = None
    if not fast:
        try:
            from gist_tpu.ops.pallas_spmm import spmm_pallas_csr
            f_pal = jax.jit(lambda x: spmm_pallas_csr(g, x))
            dt = _measure(f_pal, x)
            backend = "pallas"
        except Exception:
            dt = None
    if dt is None:
        f_seg = jax.jit(lambda x: spmm_segment(g, x))
        dt = _measure(f_seg, x)

    edges_per_sec = E / dt
    sol = 8.1e11 / (F * 4.0)          # speed-of-light edges/s (one row read per edge)
    print(json.dumps({
        "metric": f"edges/sec/chip (SpMM agg, {backend}, synth-reddit-small)",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / sol, 4),
    }))


if __name__ == "__main__":
    main()
