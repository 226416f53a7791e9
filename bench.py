"""Benchmark entry — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): edges/sec/chip for the SpMM aggregation on a
Reddit-shaped graph, using the Pallas block-dense dedup kernel
(gist_tpu/ops/pallas_spmm.py v2); falls back to the XLA segment backend
if the kernel can't compile.  ``vs_baseline`` is the fraction of the
speed-of-light bound (each edge reads one F-wide fp32 source row from
HBM once: E*F*4 bytes at ~810 GB/s) since the reference publishes no
numbers (BASELINE.md).

Extra keys in the same JSON object report the bf16 kernel, the XLA
segment path, and the full GraphSAGE train step (fwd+bwd+Adam, hidden
256) — the end-to-end number the kernel exists to improve.

Timing: per-op wall clocks through this session's remote-execution
tunnel are polluted by RTT and unreliable sync, so every measurement
runs ``iters`` iterations inside ONE jitted lax.fori_loop and fetches a
scalar (one honest sync per measurement).  Graphs travel as jit
arguments — closed-over tile layouts would be embedded as HLO literals
(100+ MB) and break remote compilation.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _probe_backend(retries: int = 4, base_sleep: float = 20.0,
                   timeout: float = 240.0):
    """Subprocess probe of the accelerator backend with bounded
    retries/backoff.  Round 2's official bench failed on a transient
    TPU-tunnel outage (`jax.devices()` hung for ~25 min then recovered,
    VERDICT.md header); probing in a child process survives both the
    hang (timeout) and the hard init error without poisoning this
    process's latched jax backend.  Returns (ok, platform_or_error)."""
    code = "import jax; print(jax.default_backend())"
    err = "unknown"
    for i in range(retries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=timeout,
                env=dict(os.environ))
            if out.returncode == 0 and out.stdout.strip():
                return True, out.stdout.strip().splitlines()[-1]
            err = (out.stderr or "").strip()[-300:] or f"rc={out.returncode}"
        except subprocess.TimeoutExpired:
            err = f"backend probe hung >{timeout:.0f}s"
        if i < retries - 1:
            time.sleep(base_sleep * (2 ** i))
    return False, err


def main():
    fast = os.environ.get("GIST_BENCH_FAST", "") == "1"
    # fast mode (CPU tests) runs in-process on an already-initialized
    # backend; the subprocess probe would query the real accelerator
    # and pay the full retry ladder for nothing
    ok, info = (True, "fast") if fast else _probe_backend()
    if not ok:
        # structured failure artifact: the driver still gets parseable
        # JSON (an "error" key) instead of a bare traceback
        print(json.dumps({
            "metric": "edges/sec/chip (SpMM agg, unavailable)",
            "value": 0.0, "unit": "edges/s", "vs_baseline": 0.0,
            "error": f"accelerator backend unreachable: {info}",
        }))
        sys.exit(1)

    import jax
    import jax.numpy as jnp
    import optax

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.models import sage
    from gist_tpu.models.common import masked_cross_entropy
    from gist_tpu.ops.spmm import set_default_backend, spmm_segment

    ds = synthetic_dataset("synth-reddit-small")
    g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes,
                         tiles=not fast)
    x = jnp.asarray(ds.features)
    E, F = g.n_edges, ds.in_feats
    sol = 8.1e11 / (F * 4.0)  # speed-of-light edges/s: one row read/edge

    def loop_time(fn, g, x, iters, baked=False):
        """``baked=True`` closes the graph into the jit as compile-time
        constants — steady-state cost, matching a long-lived training
        executable; with the graph as a runtime argument, this stack
        pays an extra per-iteration cost inside fori/scan loops for the
        captured arrays (~7 ms here), reported separately."""
        if baked:
            @jax.jit
            def run(x):
                def body(i, acc):
                    y = fn(g, x + (i.astype(x.dtype)
                                   * jnp.asarray(1e-9, x.dtype)))
                    return acc + y[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            args = (x,)
        else:
            @jax.jit
            def run(g, x):
                def body(i, acc):
                    y = fn(g, x + (i.astype(x.dtype)
                                   * jnp.asarray(1e-9, x.dtype)))
                    return acc + y[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            args = (g, x)
        float(run(*args))  # compile + warm
        t0 = time.time()
        float(run(*args))
        return (time.time() - t0) / iters

    extras = {}
    backend = "segment"
    dt = None
    if not fast:
        try:
            from gist_tpu.ops.pallas_spmm import spmm_pallas_csr
            # forward-only graph keeps the baked-constant compile
            # payload under the remote-compile limit
            g_fwd = g.replace(dedup_t=None, tiled_t=None)
            dt = loop_time(spmm_pallas_csr, g_fwd, x, iters=20,
                           baked=True)
            backend = "pallas-dedup" if g.dedup is not None else "pallas"
            dtb = loop_time(spmm_pallas_csr, g_fwd,
                            x.astype(jnp.bfloat16), iters=20, baked=True)
            extras["bf16_edges_per_sec"] = round(E / dtb, 1)
            extras["bf16_ms"] = round(dtb * 1e3, 2)
            dt_arg = loop_time(spmm_pallas_csr, g, x, iters=20)
            extras["fp32_ms_graph_as_arg"] = round(dt_arg * 1e3, 2)
        except Exception as e:  # fall back to the XLA path
            extras["pallas_error"] = f"{type(e).__name__}: {e}"[:200]
            dt = None
    dt_seg = loop_time(spmm_segment, g, x, iters=5)
    extras["segment_ms"] = round(dt_seg * 1e3, 2)
    if dt is None:
        dt, backend = dt_seg, "segment"

    # end-to-end: full SAGE train step (fwd + bwd + Adam), hidden 256
    if not fast:
        try:
            cfg = sage.SAGEConfig(F, 256, ds.n_classes, n_layers=2,
                                  dropout=0.0)
            params = sage.init(jax.random.PRNGKey(0), cfg)
            opt = optax.adam(1e-2)
            labels = jnp.asarray(ds.labels)
            mask = jnp.asarray(ds.train_mask)

            def make_step():
                def step(g, params, opt_state):
                    def loss_fn(p):
                        logits = sage.apply(p, g, x, cfg)
                        return masked_cross_entropy(logits, labels, mask)
                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    updates, opt_state = opt.update(grads, opt_state)
                    return optax.apply_updates(params, updates), opt_state

                @jax.jit
                def run(g, params, opt_state, iters):
                    def body(_, c):
                        return step(g, *c)
                    return jax.lax.fori_loop(0, iters, body,
                                             (params, opt_state))
                return run

            def time_step(iters=10):
                run = make_step()
                p, s = run(g, params, opt.init(params), iters)
                float(jax.tree.leaves(p)[0].ravel()[0])
                t0 = time.time()
                p, s = run(g, params, opt.init(params), iters)
                float(jax.tree.leaves(p)[0].ravel()[0])
                return (time.time() - t0) / iters

            set_default_backend("auto")  # pallas on this TPU
            extras["train_step_ms"] = round(time_step() * 1e3, 2)
            set_default_backend("segment")
            extras["train_step_ms_segment"] = round(time_step() * 1e3, 2)
            set_default_backend("auto")
        except Exception as e:
            extras["train_step_error"] = f"{type(e).__name__}: {e}"[:200]

    edges_per_sec = E / dt
    print(json.dumps({
        "metric": f"edges/sec/chip (SpMM agg, {backend}, "
                  f"synth-reddit-small)",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / sol, 4),
        # fp32_ms/n_edges let consumers (dryrun's scaling projection)
        # derive the single-chip aggregation time from this artifact
        # instead of a hardcoded constant
        "fp32_ms": round(dt * 1e3, 3),
        "n_edges": E,
        "hardware": jax.devices()[0].device_kind,
        **extras,
    }))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:  # terminal failure -> still a parseable line
        print(json.dumps({
            "metric": "edges/sec/chip (SpMM agg, failed)",
            "value": 0.0, "unit": "edges/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(1)
