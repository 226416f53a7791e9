"""Host-side design analysis for the Amazon2M SpMM gather-wall split.

Round-2 measurement (PERF.md): the chunked dedup kernel is bound by the
XLA row-gather op rate (~85M rows/s on this chip) — 955 ms of the
1229 ms total is the per-chunk unique-row gathers.  The lever named
there: split the adjacency into *dense* (tile, source-block) pairs
whose 1024-row source block is streamed directly from the resident
(permuted) feature table by the kernel's block pipeline — no gather op
at all — and *sparse* pairs whose senders stay in the gathered unique
slot list.  A (tile, src_block) pair with k edges costs:

  direct:  CU*F_pad*4 bytes streamed + one (TN, CU) int8 W block
  slots:   u unique senders gathered (u <= k) + u*F_pad*4 streamed
           + shared W weight

so density decides, not locality.  This script computes, from the real
synth-amazon2m graph + the cached locality permutation, the full
cost-model curve over the density threshold T — remote slots, direct
jobs, W growth, projected wall — to pick T and tile_rows before any
kernel work.  Pure numpy; runs without the TPU.
"""

import json
import sys
import time

import numpy as np

GATHER_ROWS_PER_S = 85e6      # measured XLA gather op rate (PERF.md)
PIPE_BYTES_PER_S = 195e9      # measured kernel pipeline effective rate
F_PAD = 128                   # feature tile (F=100 padded)
CU = 1024


def analyze(tn: int, senders, receivers, pos, thresholds):
    t0 = time.time()
    r_p = pos[receivers]
    s_p = pos[senders]
    tile_of = r_p // tn
    blk_of = s_p // CU
    n_blocks = int(blk_of.max()) + 1
    E = len(senders)

    # per-(tile, block) edge counts
    pair_key = tile_of.astype(np.int64) * n_blocks + blk_of
    pk, pidx, pcnt = np.unique(pair_key, return_inverse=True,
                               return_counts=True)
    # per-(tile, sender) unique slots, attributed to their pair
    ts_key = tile_of.astype(np.int64) * (int(s_p.max()) + 1) + s_p
    uk = np.unique(ts_key)
    u_tile = uk // (int(s_p.max()) + 1)
    u_blk = (uk % (int(s_p.max()) + 1)) // CU
    u_pair_key = u_tile * n_blocks + u_blk
    # unique slots per pair (aligned with pk via searchsorted)
    u_per_pair = np.bincount(np.searchsorted(pk, u_pair_key),
                             minlength=len(pk))
    print(f"tn={tn}: pairs={len(pk)} unique_slots={len(uk)} "
          f"({time.time() - t0:.0f}s)", flush=True)

    rows = []
    for T in thresholds:
        dense = pcnt >= T
        direct_jobs = int(dense.sum())
        remote_slots = int(u_per_pair[~dense].sum())
        # remote slots are cu-padded per tile: count tiles' remote jobs
        rem_tile = u_tile[~dense[np.searchsorted(pk, u_pair_key)]]
        per_tile = np.bincount(rem_tile)
        remote_jobs = int(np.ceil(per_tile / CU).sum())
        total_jobs = direct_jobs + remote_jobs
        w_gib = total_jobs * tn * CU / 2 ** 30
        t_gather = remote_slots / GATHER_ROWS_PER_S
        stream_rows = direct_jobs * CU + remote_jobs * CU
        t_pipe = (stream_rows * F_PAD * 4 + total_jobs * tn * CU) \
            / PIPE_BYTES_PER_S
        t_total = t_gather + t_pipe + 0.042  # permute+unpermute measured
        rows.append({
            "T": T, "direct_jobs": direct_jobs,
            "remote_slots": remote_slots, "remote_jobs": remote_jobs,
            "w_gib": round(w_gib, 2),
            "t_gather_ms": round(t_gather * 1e3),
            "t_pipe_ms": round(t_pipe * 1e3),
            "t_total_ms": round(t_total * 1e3),
            "edges_per_s_M": round(E / t_total / 1e6),
        })
        print(rows[-1], flush=True)
    return rows


def main():
    from gist_tpu.data import synthetic_dataset

    tn = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    t0 = time.time()
    ds = synthetic_dataset("synth-amazon2m")
    print(f"dataset {time.time() - t0:.0f}s", flush=True)

    cache = "data/amazon_spmm_layout_v2_tn64_c4194304.npz"
    z = np.load(cache)
    perm = z["pm"]                     # row -> node
    pos = np.empty_like(perm)
    pos[perm] = np.arange(len(perm))   # node -> row
    del z

    rows = analyze(tn, ds.senders, ds.receivers, pos,
                   thresholds=[32, 64, 96, 128, 192, 256, 384, 512])
    with open(f"results/r3_amazon_split_analysis_tn{tn}.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
