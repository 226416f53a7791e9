"""Cluster-GCN single-chip CLI — parity with cluster_gcn/cluster_gcn.py."""

import argparse

from gist_tpu.cli.common import add_common_args, apply_backend
from gist_tpu.data import load_dataset
from gist_tpu.models import sage
from gist_tpu.train.cluster import train_cluster_gcn
from gist_tpu.train.common import TrainConfig, write_results


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Cluster-GCN (cluster_gcn.py parity)")
    add_common_args(p)
    p.add_argument("--psize", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--use-pp", action="store_true")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--use-f1", action="store_true")
    p.add_argument("--use-layernorm-flag", dest="use_ln", action="store_true",
                   help="reference spelling: --use-layernorm store_true")
    p.add_argument("--model-type", type=str, default="sage")
    p.add_argument("--cache-dir", type=str, default=None)
    p.add_argument("--eval-cpu", action="store_true")
    p.add_argument("--eval-every", type=int, default=1,
                   help="full-graph eval cadence in epochs (huge graphs: "
                        "eval dominates wall clock; the last epoch always "
                        "evaluates)")
    p.add_argument("--scan-batches", action="store_true",
                   help="stack each epoch's batches and lax.scan them "
                        "(one dispatch per epoch)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype")
    args = p.parse_args(argv)
    apply_backend(args)
    assert args.model_type == "sage", "only sage supported (cluster_gcn.py:67)"

    ds = load_dataset(args.dataset, args.data_root)
    print(ds.summary())
    cfg = sage.SAGEConfig(
        in_feats=ds.in_feats, n_hidden=args.n_hidden, n_classes=ds.n_classes,
        n_layers=args.n_layers, dropout=args.dropout,
        use_layernorm=args.use_ln or args.use_layernorm == "True",
        use_pp=args.use_pp, dtype=args.dtype)
    tc = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                     n_epochs=args.n_epochs, seed=args.rnd_seed)
    results = train_cluster_gcn(
        ds, cfg, tc, psize=args.psize, batch_size=args.batch_size,
        use_pp=args.use_pp, use_f1=args.use_f1, normalize=args.normalize,
        cache_dir=args.cache_dir, eval_cpu=args.eval_cpu,
        eval_every=args.eval_every, scan_batches=args.scan_batches)
    write_results(results, args.result_json)
    return results


if __name__ == "__main__":
    main()
