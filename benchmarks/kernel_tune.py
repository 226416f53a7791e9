"""Flat dedup-kernel parameter sweep on the bench graph (headline
tuning: bench.py reports tile_rows=128's number; this measures the
tile_rows / dtype matrix so the default is chosen from data, not
habit).

Bigger destination tiles share senders across more rows (d = |unique
slots| / E falls -> fewer gathered rows, the 5.9 ms of the 9.9 ms
round-2 headline) at the price of a larger W stream (bytes ~ d*E*TN).
At Reddit-small scale everything fits, so the tradeoff is purely
measured.

Usage: python benchmarks/kernel_tune.py   (real chip)
Writes results/r3_kernel_tune.json.
"""

import json
import time

import numpy as np


def loop_time(fn, g, x, iters=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(g, x + (i.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)))
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(run(x))
    t0 = time.time()
    _ = float(run(x))
    return (time.time() - t0) / iters


def main():
    import jax.numpy as jnp

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.ops.pallas_spmm import spmm_pallas_csr
    from gist_tpu.utils import hardware_tag

    ds = synthetic_dataset("synth-reddit-small")
    E, F = len(ds.senders), ds.features.shape[1]
    x32 = jnp.asarray(ds.features)
    x16 = x32.astype(jnp.bfloat16)
    rows = []
    for tn in (64, 128, 256):
        g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes,
                             tiles=True, tile_rows=tn)
        if g.dedup is None:
            print(f"tn={tn}: dedup build bailed", flush=True)
            continue
        g_fwd = g.replace(dedup_t=None, tiled_t=None)
        d = float(np.asarray(g.dedup.job_offsets)[-1]) * g.dedup.cu / E
        w_mib = np.asarray(g.dedup.w_blocks).nbytes / 2 ** 20
        for dtype, xv in (("fp32", x32), ("bf16", x16)):
            dt = loop_time(spmm_pallas_csr, g_fwd, xv)
            rows.append({"tile_rows": tn, "dtype": dtype,
                         "d_slot": round(d, 3), "w_mib": round(w_mib, 1),
                         "ms": round(dt * 1e3, 2),
                         "edges_per_s_M": round(E / dt / 1e6, 1)})
            print(rows[-1], flush=True)
    # gather-rate microbench: does row-byte alignment change the
    # take() rate?  (F=602 fp32 rows are 2408 B — not 512-aligned; the
    # padded table's 640-col rows are 2560 B.)
    import jax

    gather_rows = []
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, ds.n_nodes, 1 << 20).astype(np.int32))
    for cols in (602, 608, 640):
        xv = jnp.pad(x32, ((0, 0), (0, cols - F))) if cols > F else x32

        @jax.jit
        def run(xv, idx):
            def body(i, acc):
                rows = jnp.take(xv, idx + i, axis=0)
                return acc + rows[0, 0]
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

        _ = float(run(xv, idx))
        t0 = time.time()
        _ = float(run(xv, idx))
        dt = (time.time() - t0) / 10
        gbs = len(idx) * cols * 4 / dt / 1e9
        gather_rows.append({"cols": cols, "ms_per_1M_rows": round(
            dt * 1e3, 2), "GB_s": round(gbs, 1),
            "rows_per_s_M": round(len(idx) / dt / 1e6, 1)})
        print(gather_rows[-1], flush=True)

    out = {"dataset": "synth-reddit-small", "n_edges": E, "f": F,
           "hardware": hardware_tag(), "rows": rows,
           "gather_microbench": gather_rows}
    with open("results/r3_kernel_tune.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["rows"][-1] if rows else {}), flush=True)


if __name__ == "__main__":
    main()
