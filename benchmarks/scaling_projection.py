"""Multi-chip scaling-efficiency projection (BASELINE.md >=80% star).

Real multi-chip hardware isn't reachable from this environment, so the
number is a roofline projection, not a measurement: shard the bench
graph over D devices with the real partitioner, take the measured
single-chip SpMM aggregation time (bench.py / PERF.md), and combine the
slowest shard's edge share with the ring-halo bytes over one ICI link
(model in ShardedGraph.projected_scaling).  Writes
results/r2_scaling_projection.json.

Usage:  python benchmarks/scaling_projection.py [t1_ms_fp32 t1_ms_bf16]
"""

import json
import sys


def main(argv=None):
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.parallel import build_sharded_graph

    argv = list(sys.argv[1:] if argv is None else argv)
    t1_fp32 = float(argv[0]) / 1e3 if argv else 9.9e-3      # PERF.md
    t1_bf16 = float(argv[1]) / 1e3 if len(argv) > 1 else 7.2e-3

    ds = synthetic_dataset("synth-reddit-small")
    f = int(ds.features.shape[1])
    out = {"dataset": "synth-reddit-small", "f": f,
           "t1_agg_ms_fp32": t1_fp32 * 1e3, "t1_agg_ms_bf16": t1_bf16 * 1e3,
           "ici_bytes_per_s": 4.5e10, "projections": []}
    for d in (2, 4, 8):
        sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
        cs = sg.comm_stats(f=f)
        p32 = sg.projected_scaling(t1_fp32, f)
        p16 = sg.projected_scaling(t1_bf16, f, itemsize=2)
        out["projections"].append({
            "n_devices": d,
            "edge_balance": p32["edge_balance"],
            "ring_waste": cs["ring_waste"],
            "wire_bytes_per_device_fp32": p32["wire_bytes_per_device"],
            "efficiency_overlap_fp32": p32["efficiency_overlap"],
            "efficiency_serial_fp32": p32["efficiency_serial"],
            "efficiency_overlap_bf16": p16["efficiency_overlap"],
            "projected_edges_per_s_fp32":
                ds.senders.shape[0] / p32["t_step_overlap_s"],
        })
        print(f"D={d}: balance {p32['edge_balance']:.3f}x, ring waste "
              f"{cs['ring_waste']:.2f}x, eff fp32 "
              f"{p32['efficiency_overlap']:.1%} (serial "
              f"{p32['efficiency_serial']:.1%}), bf16 "
              f"{p16['efficiency_overlap']:.1%}", flush=True)
    path = "results/r2_scaling_projection.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2, default=float)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
