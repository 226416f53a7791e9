"""Reference-headline-scale SpMM benchmark: full synth-amazon2m
(125M directed edges, F=100) aggregation on one chip.

At this scale neither Pallas layout fits in one shot (the flat dedup
gather alone is ~20 GB), so this exercises the CHUNKED dedup layout
(gist_tpu/graph.py:ChunkedDedupTiles): W blocks + features resident,
per-chunk bounded gathers, one compiled kernel shape for all chunks.
Compares against the memory-bounded XLA segment path
(spmm_segment_chunked) for correctness and speed.

Device-memory discipline: the kernel run uses a Graph carrying ONLY
the forward chunked layout (dummy COO arrays — the transpose W would
double resident bytes); the segment run uses the real COO arrays with
no tiles.  Results -> results/r2_amazon_spmm.json.

tile_rows=64 halves the resident W vs the default 128 (W bytes ~
d*E*TN; d=0.64 on this graph -> ~5 GiB), which is what lets W + x +
one chunk's gather + the scan output coexist in 16 GB HBM.  The built
layout caches to data/ (the partitioner is the remaining build cost).

Round 3 adds the SPLIT layout (v3, graph.py:_build_dedup_split_chunked):
dense (tile, source-block) pairs stream directly from the resident
feature table — no gather op — and only sparse slots are gathered,
attacking the measured ~85M rows/s gather-op wall (the 955 ms of the
round-2 1229 ms total).  Results -> results/r3_amazon_spmm.json.

Usage:  python benchmarks/amazon_spmm_bench.py [chunk_rows_log2=21]
            [threshold=128]   # 0 = round-2 v2 layout (no split)
"""

import json
import os
import sys
import time

import numpy as np


def loop_time(fn, g, x, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(g, x):
        def body(i, acc):
            y = fn(g, x + (i.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)))
            return acc + y[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0, x.dtype))

    # fetch the scalar: on this remote-execution stack block_until_ready
    # does not reliably synchronize, a value fetch always does
    _ = float(run(g, x))
    t0 = time.time()
    _ = float(run(g, x))
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import Graph, _build_dedup_chunked, graph_from_edges
    from gist_tpu.ops.pallas_spmm import spmm_pallas_csr
    from gist_tpu.ops.spmm import spmm_segment_chunked

    from gist_tpu.graph import ChunkedDedupTiles

    chunk_rows = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 21)
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    # CU=512 halves the per-tile slot padding (81.4M -> ~75.6M gathered
    # rows on this graph) at 2x the job count — the one remaining
    # practical lever per the round-3 cost model
    cu = int(os.environ.get("SPMM_CU", "1024"))
    tn = 64
    t0 = time.time()
    ds = synthetic_dataset("synth-amazon2m")
    E, F = len(ds.senders), ds.features.shape[1]
    print(f"dataset {time.time()-t0:.0f}s N={ds.n_nodes} E={E} F={F}",
          flush=True)

    ver = "v2" if threshold == 0 else f"v3t{threshold}"
    if cu != 1024:
        ver += f"u{cu}"
    cache = f"data/amazon_spmm_layout_{ver}_tn{tn}_c{chunk_rows}.npz"
    t0 = time.time()
    opt_keys = ("pos", "perm", "dir_blk", "rem_blk", "is_dir")
    legacy = {"pos": "p", "perm": "pm"}  # round-2 v2 cache key names
    if os.path.exists(cache):
        z = np.load(cache)
        extra = {}
        for k in opt_keys:
            if k in z:
                extra[k] = z[k]
            elif legacy.get(k) in z:
                extra[k] = z[legacy[k]]
        dc = ChunkedDedupTiles(
            u_senders=z["u"], w_blocks=z["w"], job_offsets=z["o"],
            tile_rows=tn, cu=cu,
            max_jobs=int(z["mj"]), num_tiles=int(z["nt"]), **extra)
    else:
        if threshold == 0:
            dc = _build_dedup_chunked(ds.senders, ds.receivers,
                                      ds.n_nodes, tile_rows=tn, cu=cu,
                                      chunk_rows=chunk_rows)
        else:
            from gist_tpu.graph import _build_dedup_split_chunked
            dc = _build_dedup_split_chunked(
                ds.senders, ds.receivers, ds.n_nodes, tile_rows=tn,
                cu=cu, threshold=threshold, chunk_rows=chunk_rows)
        assert dc is not None
        os.makedirs("data", exist_ok=True)
        kw = {k: np.asarray(getattr(dc, k)) for k in opt_keys
              if getattr(dc, k) is not None}
        np.savez(cache, u=np.asarray(dc.u_senders),
                 w=np.asarray(dc.w_blocks),
                 o=np.asarray(dc.job_offsets),
                 mj=dc.max_jobs, nt=dc.num_tiles, **kw)
    w_gib = dc.w_blocks.nbytes / 2 ** 30
    gathered = int(np.asarray(dc.u_senders).size)
    direct_jobs = 0 if dc.is_dir is None else int(np.asarray(dc.is_dir).sum())
    dc = dc.to_device()  # numpy leaves would re-transfer W per jit call
    n_chunks = dc.n_chunks
    print(f"{ver} layout {time.time()-t0:.0f}s: chunks={dc.n_chunks} "
          f"jobs_pad={dc.w_blocks.shape[1]} W={w_gib:.2f} GiB "
          f"max_jobs={dc.max_jobs} gathered_rows={gathered / 1e6:.1f}M "
          f"direct_jobs={direct_jobs}", flush=True)

    x = jnp.asarray(ds.features)
    dummy = jnp.zeros(8, jnp.int32)
    dummy_ptr = jnp.zeros(ds.n_nodes + 1, jnp.int32)
    deg = jnp.zeros(ds.n_nodes, jnp.float32)
    pal_g = Graph(senders=dummy, receivers=dummy, indptr=dummy_ptr,
                  in_degrees=deg, out_degrees=deg, t_senders=dummy,
                  t_receivers=dummy, t_indptr=dummy_ptr,
                  n_nodes=ds.n_nodes, n_edges=E, dedup_c=dc)

    # Memory discipline at W >= 8 GiB (the v3 split layouts): the
    # pallas phase (W + x + out) and the segment phase (COO + x + out)
    # must NOT coexist in 16 GB HBM, and neither can a full 1 GB
    # got/want pair plus compare temps.  So: pallas correctness sample
    # (strided rows to host) -> pallas timing -> drop the layout ->
    # build the segment graph -> segment sample + timing -> compare on
    # host.  Full-rank parity is interpret-tested in CI
    # (tests/test_pallas_spmm.py); the on-chip check here is a 50k-row
    # sample.
    stride = max(ds.n_nodes // 50_000, 1)
    t0 = time.time()
    got = jax.jit(spmm_pallas_csr)(pal_g, x)
    got_sample = np.asarray(got[::stride])       # forces execution
    print(f"pallas first call+sample {time.time()-t0:.0f}s", flush=True)
    del got

    pal_s = loop_time(spmm_pallas_csr, pal_g, x, iters=10)
    print(f"pallas chunked: {pal_s*1e3:.1f} ms -> {E/pal_s/1e6:.0f}M "
          f"edges/s", flush=True)
    del pal_g, dc
    import gc
    gc.collect()

    t0 = time.time()
    seg_g = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    print(f"graph {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    want = jax.jit(spmm_segment_chunked)(seg_g, x)
    want_sample = np.asarray(want[::stride])
    print(f"segment first call+sample {time.time()-t0:.0f}s", flush=True)
    del want
    err = float(np.max(np.abs(got_sample - want_sample))
                / max(np.max(np.abs(want_sample)), 1e-20))
    print(f"rel err (sampled {len(got_sample)} rows) {err:.2e}",
          flush=True)

    seg_s = loop_time(spmm_segment_chunked, seg_g, x, iters=3)
    print(f"segment chunked: {seg_s*1e3:.1f} ms -> {E/seg_s/1e6:.0f}M "
          f"edges/s", flush=True)

    sol_s = E * F * 4 / 8.1e11   # one F-wide fp32 row read per edge
    from gist_tpu.utils import hardware_tag
    out = {
        "dataset": "synth-amazon2m", "n_nodes": ds.n_nodes, "n_edges": E,
        "f": F, "layout": ver, "threshold": threshold, "cu": cu,
        "n_chunks": n_chunks, "w_gib": w_gib,
        "gathered_rows": gathered, "direct_jobs": direct_jobs,
        "hardware": hardware_tag(),
        "rel_err_vs_segment": err,
        "pallas_chunked_ms": pal_s * 1e3,
        "pallas_edges_per_sec": E / pal_s,
        "segment_chunked_ms": seg_s * 1e3,
        "segment_edges_per_sec": E / seg_s,
        "speedup_vs_segment": seg_s / pal_s,
        "frac_of_per_edge_sol": sol_s / pal_s,
    }
    out_path = os.environ.get(
        "SPMM_OUT", f"results/r4_amazon_spmm_{ver}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
