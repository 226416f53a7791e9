"""Round-2 result re-record on the real chip (the round-1 numbers were
invalidated by the process-salted dataset seeding and the saturating
flat SBM; see VERDICT r1 #1/#5).

Usage:  python benchmarks/record_r2.py [singles|ultrawide|all]

Writes results/r2_*.json.  The focused sweep curves are recorded
separately via  python -m gist_tpu.sweeps.run --sweep reddit-ist-focus.
"""

import json
import sys
import time


def write(name, res):
    import numpy as np
    path = f"results/{name}.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=2, default=float)
    keys = {k: res[k] for k in ("best_val_acc", "best_test_acc", "kteps",
                                "train_time", "best_val", "best_test")
            if k in res}
    print(f"{name}: {keys}", flush=True)


def singles():
    from gist_tpu.data import synthetic_dataset
    from gist_tpu.models import sage, gcn
    from gist_tpu.train.common import TrainConfig
    from gist_tpu.train.full_graph import train_full_graph
    from gist_tpu.train.cluster import train_cluster_gcn

    # cora-shaped full-graph GCN, reference hyperparams (train.py)
    ds = synthetic_dataset("synth-cora")
    cfg = gcn.GCNConfig(ds.in_feats, 256, ds.n_classes, n_layers=1,
                        dropout=0.5)
    tc = TrainConfig(lr=1e-2, weight_decay=5e-4, n_epochs=400,
                     lr_schedule=True)
    write("r2_cora_gcn", train_full_graph(ds, cfg, tc, scan_epochs=50,
                                          verbose=False))

    # reddit-shaped full-graph SAGE, fp32 and bf16 (auto backend ->
    # pallas dedup kernel on the chip)
    ds = synthetic_dataset("synth-reddit-small")
    ds.normalize_features()
    for dtype in ("float32", "bfloat16"):
        cfg = sage.SAGEConfig(ds.in_feats, 256, ds.n_classes, n_layers=2,
                              dropout=0.2, dtype=dtype)
        tc = TrainConfig(lr=1e-2, weight_decay=0.0, n_epochs=60)
        write(f"r2_reddit_full_{dtype}",
              train_full_graph(ds, cfg, tc, model=sage, scan_epochs=20,
                               verbose=False))

    # reddit cluster-GCN baseline (reference config shape)
    cfg = sage.SAGEConfig(ds.in_feats, 256, ds.n_classes, n_layers=2,
                          dropout=0.2)
    tc = TrainConfig(lr=3e-2, weight_decay=0.0, n_epochs=40)
    write("r2_reddit_cluster_baseline",
          train_cluster_gcn(ds, cfg, tc, psize=1500, batch_size=20,
                            use_f1=True, scan_batches=True,
                            verbose=False))


def ultrawide(only=None):
    """``only``: optional "h,K" string to record a single config (the
    K=1 full-width control runs on the real chip — it needs only one
    device — while the K=8 family needs the 8-device CPU mesh)."""
    from gist_tpu.data import synthetic_dataset
    from gist_tpu.models import sage
    from gist_tpu.train.common import TrainConfig
    from gist_tpu.train.ist_ultrawide import train_ist_ultrawide

    ds = synthetic_dataset("synth-amazon2m-small")
    ds.normalize_features()
    grid = ((512, 8), (1024, 8), (2048, 8), (2048, 1))
    if only:
        h0, k0 = (int(v) for v in only.split(","))
        grid = ((h0, k0),)
    for h, K in grid:
        cfg = sage.SAGEConfig(ds.in_feats, h, ds.n_classes, n_layers=2,
                              dropout=0.2)
        tc = TrainConfig(lr=1e-2, weight_decay=0.0, n_epochs=40,
                         num_subnet=K, iter_per_site=150)
        t0 = time.time()
        res = train_ist_ultrawide(ds, cfg, tc, psize=1500, batch_size=10,
                                  use_f1=True, eval_every_rounds=2,
                                  verbose=False)
        res["wall_time"] = time.time() - t0
        write(f"r2_uw_h{h}_k{K}", res)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("singles", "all"):
        singles()
    if what.startswith("ultrawide:"):
        ultrawide(only=what.split(":", 1)[1])
    elif what in ("ultrawide", "all"):
        ultrawide()
