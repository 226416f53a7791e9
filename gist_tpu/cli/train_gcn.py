"""Full-graph GCN baseline CLI — parity with gcn/train.py."""

import argparse

from gist_tpu.cli.common import add_common_args, apply_backend, str2bool
from gist_tpu.data import load_dataset
from gist_tpu.models import gcn
from gist_tpu.train.common import TrainConfig, write_results
from gist_tpu.train.full_graph import train_full_graph


def main(argv=None):
    p = argparse.ArgumentParser(description="GCN (gcn/train.py parity)")
    add_common_args(p)
    p.add_argument("--self_loop", type=str, default="True")
    p.add_argument("--lr_scheduler", action="store_true", default=False)
    p.add_argument("--scan-epochs", type=int, default=0,
                   help="fuse this many epochs per jitted call (0 = "
                        "per-epoch dispatch, reference-style)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace here")
    args = p.parse_args(argv)
    apply_backend(args)

    ds = load_dataset(args.dataset, args.data_root,
                      self_loop=str2bool(args.self_loop))
    print(ds.summary())
    cfg = gcn.GCNConfig(
        in_feats=ds.in_feats, n_hidden=args.n_hidden, n_classes=ds.n_classes,
        n_layers=args.n_layers, dropout=args.dropout,
        use_layernorm=str2bool(args.use_layernorm))
    tc = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                     n_epochs=args.n_epochs, lr_schedule=args.lr_scheduler,
                     seed=args.rnd_seed)
    from gist_tpu.utils import profile_trace
    with profile_trace(args.profile_dir):
        results = train_full_graph(ds, cfg, tc,
                                   scan_epochs=args.scan_epochs)
    write_results(results, args.result_json)
    return results


if __name__ == "__main__":
    main()
