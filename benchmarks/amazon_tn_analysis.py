"""Tile-size cost model for the Amazon2M chunked SpMM (round 3).

The tn=64 split analysis showed the dense/sparse split washes out: only
~16% of unique slots live in dense (tile, source-block) pairs, so the
gather count barely drops.  The stronger lever is tile size itself —
unique (tile, sender) slots shrink as tiles grow (2x the rows share one
slot), directly cutting the ~85M rows/s gather wall, at the price of a
bigger W (bytes ~ slots * TN).  This computes exact slot counts, job
padding, W size, and the modeled wall for tn in {64, 128, 256, 512},
combined with the split threshold where it still helps.

Uses the cached tn=64 locality ordering for every tn (the ordering is
psize-dependent in production; close enough for sizing).
"""

import json
import time

import numpy as np

GATHER_ROWS_PER_S = 85e6
PIPE_BYTES_PER_S = 195e9
F_PAD = 128
CU = 1024
HBM_BUDGET_GIB = 11.0   # W must fit beside x (1.25 GiB padded), the
                        # chunk gather buffer (~2 GiB) and output


def model(tn, senders_p, receivers_p, thresholds=(None,)):
    E = len(senders_p)
    tile_of = receivers_p // tn
    num_tiles = int(tile_of.max()) + 1
    t0 = time.time()
    k = tile_of.astype(np.int64) * (int(senders_p.max()) + 1) + senders_p
    uk = np.unique(k)
    u_tile = uk // (int(senders_p.max()) + 1)
    u_cnt = np.bincount(u_tile, minlength=num_tiles)
    slots = len(uk)
    jobs = int(np.ceil(u_cnt / CU).sum())
    rows = []
    for T in thresholds:
        if T is None:
            rem_jobs, direct_jobs = jobs, 0
        else:
            blk = (uk % (int(senders_p.max()) + 1)) // CU
            n_blocks = int(blk.max()) + 1
            pair = u_tile * n_blocks + blk
            # count EDGES per pair for the threshold
            e_pair = (tile_of.astype(np.int64) * n_blocks
                      + senders_p // CU)
            pk, pcnt = np.unique(e_pair, return_counts=True)
            dense = pcnt >= T
            slot_dense = dense[np.searchsorted(pk, pair)]
            rem_per_tile = np.bincount(u_tile[~slot_dense],
                                       minlength=num_tiles)
            rem_jobs = int(np.ceil(rem_per_tile / CU).sum())
            direct_jobs = int(dense.sum())
        total_jobs = rem_jobs + direct_jobs
        w_gib = total_jobs * tn * CU / 2 ** 30
        t_gather = rem_jobs * CU / GATHER_ROWS_PER_S
        t_pipe = (total_jobs * CU * F_PAD * 4
                  + total_jobs * tn * CU) / PIPE_BYTES_PER_S
        t_total = t_gather + t_pipe + 0.042
        rows.append({
            "tn": tn, "T": T, "slots_M": round(slots / 1e6, 1),
            "rem_jobs": rem_jobs, "direct_jobs": direct_jobs,
            "w_gib": round(w_gib, 2), "fits": w_gib <= HBM_BUDGET_GIB,
            "t_gather_ms": round(t_gather * 1e3),
            "t_pipe_ms": round(t_pipe * 1e3),
            "t_total_ms": round(t_total * 1e3),
            "edges_per_s_M": round(E / t_total / 1e6),
            "analysis_s": round(time.time() - t0),
        })
        print(rows[-1], flush=True)
    return rows


def main():
    from gist_tpu.data import synthetic_dataset

    ds = synthetic_dataset("synth-amazon2m")
    z = np.load("data/amazon_spmm_layout_v2_tn64_c4194304.npz")
    perm = z["pm"]
    pos = np.empty_like(perm)
    pos[perm] = np.arange(len(perm))
    del z
    s_p = pos[ds.senders]
    r_p = pos[ds.receivers]

    all_rows = []
    all_rows += model(64, s_p, r_p, thresholds=(None,))
    all_rows += model(128, s_p, r_p, thresholds=(None, 512))
    all_rows += model(256, s_p, r_p, thresholds=(None, 512))
    all_rows += model(512, s_p, r_p, thresholds=(None,))
    with open("results/r3_amazon_tn_analysis.json", "w") as f:
        json.dump(all_rows, f, indent=2)


if __name__ == "__main__":
    main()
