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

    # GAT fused attention over the dedup layout (round 4): scores are
    # rank-1 in the node scores, so the kernel needs no per-edge data
    # and the message matmul runs over unique sender rows.  Measured
    # against the XLA composite (SDDMM + segment softmax + weighted
    # segment sum) on the same graph at D=128.
    if not fast and os.environ.get("GIST_BENCH_GAT", "1") == "1":
        try:
            from gist_tpu.ops.pallas_gat import (_xla_reference,
                                                 gat_attention_dedup)
            rng_g = np.random.default_rng(7)
            zdim = min(F, 128)
            z = x[:, :zdim]
            av = jnp.asarray(
                rng_g.standard_normal(ds.n_nodes).astype(np.float32))
            bv = jnp.asarray(
                rng_g.standard_normal(ds.n_nodes).astype(np.float32))
            if g.dedup is not None:
                g_att = g.replace(dedup_t=None, tiled_t=None)
                dtg = loop_time(
                    lambda g_, z_: gat_attention_dedup(g_, z_, av, bv, 0.01),
                    g_att, z, iters=10, baked=True)
                extras["gat_dedup_ms"] = round(dtg * 1e3, 2)
                extras["gat_dedup_edges_per_sec"] = round(E / dtg, 1)
                dtx = loop_time(
                    lambda g_, z_: _xla_reference(g_, z_, av, bv, 0.01),
                    g, z, iters=5, baked=True)
                extras["gat_segment_ms"] = round(dtx * 1e3, 2)
                extras["gat_dedup_speedup"] = round(dtx / dtg, 2)
        except Exception as e:
            extras["gat_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # Amazon2M-scale regression guard (VERDICT r3 weak #6): the
    # headline above runs the FLAT dedup layout; the 2.45M-node scale
    # runs the CHUNKED layout (lax.scan over bounded per-chunk gathers,
    # graph.py:ChunkedDedupTiles), whose cost structure — the gather
    # wall — the flat number cannot see.  Full-scale needs ~10 min of
    # host setup, so the driver-captured artifact measures the chunked
    # MACHINERY on synth-amazon2m-small with forced chunking (16
    # chunks); the full-scale numbers live in results/r4_amazon_spmm_*
    # (benchmarks/amazon_spmm_bench.py).
    if not fast and os.environ.get("GIST_BENCH_AMAZON", "1") == "1":
        try:
            from gist_tpu.graph import Graph, _build_dedup_chunked
            ds2 = synthetic_dataset("synth-amazon2m-small")
            E2 = len(ds2.senders)
            cache = "data/bench_chunked_small.npz"
            if os.path.exists(cache):
                from gist_tpu.graph import ChunkedDedupTiles
                z = np.load(cache)
                dc = ChunkedDedupTiles(
                    u_senders=z["u"], w_blocks=z["w"], job_offsets=z["o"],
                    tile_rows=64, cu=1024, max_jobs=int(z["mj"]),
                    num_tiles=int(z["nt"]), pos=z["pos"], perm=z["perm"])
            else:
                dc = _build_dedup_chunked(ds2.senders, ds2.receivers,
                                          ds2.n_nodes, tile_rows=64,
                                          chunk_rows=2 ** 13)
                os.makedirs("data", exist_ok=True)
                np.savez(cache, u=np.asarray(dc.u_senders),
                         w=np.asarray(dc.w_blocks),
                         o=np.asarray(dc.job_offsets), mj=dc.max_jobs,
                         nt=dc.num_tiles, pos=np.asarray(dc.pos),
                         perm=np.asarray(dc.perm))
            dc = dc.to_device()
            x2 = jnp.asarray(ds2.features)
            dummy = jnp.zeros(8, jnp.int32)
            dptr = jnp.zeros(ds2.n_nodes + 1, jnp.int32)
            deg = jnp.zeros(ds2.n_nodes, jnp.float32)
            g2 = Graph(senders=dummy, receivers=dummy, indptr=dptr,
                       in_degrees=deg, out_degrees=deg, t_senders=dummy,
                       t_receivers=dummy, t_indptr=dptr,
                       n_nodes=ds2.n_nodes, n_edges=E2, dedup_c=dc)
            from gist_tpu.ops.pallas_spmm import spmm_pallas_csr
            # graph as ARGUMENT: baking the multi-chunk W blocks into
            # the jit exceeds the remote-compile HTTP body limit (413)
            dtc = loop_time(spmm_pallas_csr, g2, x2, iters=10)
            extras["chunked_small_ms"] = round(dtc * 1e3, 2)
            extras["chunked_small_edges_per_sec"] = round(E2 / dtc, 1)
            extras["chunked_small_n_chunks"] = dc.n_chunks
        except Exception as e:
            extras["chunked_small_error"] = f"{type(e).__name__}: {e}"[:200]

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
