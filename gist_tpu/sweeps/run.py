"""Sweep CLI: ``python -m gist_tpu.sweeps.run --sweep reddit-ist``."""

from __future__ import annotations

import argparse
import json


def _run_one(*, dataset, trial=0, n_hidden=256, n_layers=2, lr=1e-2,
             dropout=0.2, n_epochs=40, weight_decay=0.0, num_subnet=1,
             iter_per_site=None, psize=None, batch_size=20,
             split_output=False, n_heads=None, ultra_wide=False,
             lsgd=False):
    """Dispatch a single config to the right trainer."""
    from gist_tpu.data import load_dataset
    from gist_tpu.train.common import TrainConfig

    ds = load_dataset(dataset)
    tc = TrainConfig(lr=lr, weight_decay=weight_decay, n_epochs=n_epochs,
                     seed=trial, num_subnet=num_subnet,
                     iter_per_site=iter_per_site or 5,
                     split_output=split_output)

    if n_heads is not None:
        from gist_tpu.models import gat
        from gist_tpu.train.ist_cluster import train_ist_cluster
        cfg = gat.GATConfig(ds.in_feats, n_hidden, ds.n_classes,
                            n_layers=max(n_layers, 2), n_heads=n_heads)
        return train_ist_cluster(ds, cfg, tc, psize=psize or 1500,
                                 batch_size=batch_size, model=gat,
                                 kind="gat", verbose=False)
    if psize is not None:
        from gist_tpu.models import sage
        cfg = sage.SAGEConfig(ds.in_feats, n_hidden, ds.n_classes,
                              n_layers=n_layers, dropout=dropout)
        if ultra_wide:
            from gist_tpu.train.ist_ultrawide import train_ist_ultrawide
            return train_ist_ultrawide(ds, cfg, tc, psize=psize,
                                       batch_size=batch_size, verbose=False)
        if num_subnet > 1 or lsgd:
            from gist_tpu.train.ist_cluster import train_ist_cluster
            return train_ist_cluster(ds, cfg, tc, psize=psize,
                                     batch_size=batch_size, lsgd=lsgd,
                                     verbose=False)
        from gist_tpu.train.cluster import train_cluster_gcn
        # scan_batches: one jit per epoch instead of one dispatch per
        # cluster batch (this session's remote tunnel makes per-batch
        # dispatch seconds-slow; semantics are identical)
        return train_cluster_gcn(ds, cfg, tc, psize=psize,
                                 batch_size=batch_size, scan_batches=True,
                                 verbose=False)
    # full-graph small datasets
    from gist_tpu.models import gcn
    cfg = gcn.GCNConfig(ds.in_feats, n_hidden, ds.n_classes,
                        n_layers=n_layers, dropout=dropout)
    if num_subnet > 1:
        from gist_tpu.ist.simulate import train_ist_simulation
        return train_ist_simulation(ds, cfg, tc, verbose=False)
    from gist_tpu.train.full_graph import train_full_graph
    return train_full_graph(ds, cfg, tc, verbose=False)


def main(argv=None):
    from gist_tpu.sweeps.configs import SWEEPS
    from gist_tpu.sweeps.runner import SweepRunner, summarize

    p = argparse.ArgumentParser(description="gist_tpu sweep runner")
    p.add_argument("--sweep", required=True, choices=sorted(SWEEPS))
    p.add_argument("--dataset", type=str, default=None,
                   help="override the sweep's default dataset")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--trials", type=int, default=1)
    p.add_argument("--limit", type=int, default=None,
                   help="run only the first N configs")
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="run on a virtual N-device CPU mesh (the "
                        "N-processes-one-GPU analog, SURVEY §4): "
                        "multi-subnet configs need num_subnet devices, "
                        "which a single real chip can't provide")
    args = p.parse_args(argv)
    if args.cpu_mesh:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    configs = SWEEPS[args.sweep](**({"dataset": args.dataset}
                                    if args.dataset else {}))
    configs = list(configs)
    if args.limit:
        configs = configs[:args.limit]
    out = args.out or f"results/{args.sweep}.jsonl"
    runner = SweepRunner(_run_one, out, trials=args.trials)
    runner.run(configs)
    for row in summarize(out)[:10]:
        print(json.dumps(row, default=float))


if __name__ == "__main__":
    main()
