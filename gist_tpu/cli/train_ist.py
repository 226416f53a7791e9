"""Single-chip IST (GIST simulation) CLI — parity with gcn/train_ist.py.

The reference's sequential subnet loop becomes a vmapped parallel step
(gist_tpu/ist/simulate.py); flags keep the reference spellings,
including string booleans (train_ist.py:42-59)."""

import argparse

from gist_tpu.cli.common import add_common_args, apply_backend, str2bool
from gist_tpu.data import load_dataset
from gist_tpu.ist.simulate import train_ist_simulation
from gist_tpu.models import gcn
from gist_tpu.train.common import TrainConfig, write_results


def main(argv=None):
    p = argparse.ArgumentParser(description="GIST (train_ist.py parity)")
    add_common_args(p)
    p.add_argument("--use_ist", type=str, default="True")
    p.add_argument("--iter_per_site", type=int, default=5)
    p.add_argument("--num_subnet", type=int, default=2)
    p.add_argument("--split_output", type=str, default="False")
    p.add_argument("--split_input", type=str, default="True")
    p.add_argument("--self_loop", type=str, default="True")
    p.add_argument("--use_random_proj", type=str, default="True")
    p.add_argument("--fused", action="store_true",
                   help="jit one whole IST round per call (dispatch + "
                        "scan + merge + eval); metrics become per-round")
    args = p.parse_args(argv)
    apply_backend(args)

    assert str2bool(args.use_ist), "Should train with IST (train_ist.py:289)"
    # non-divisible --n-hidden is fine: partitions pad to ceil width
    # with virtual units (ist/partition.py VIRTUAL_IDX)

    ds = load_dataset(args.dataset, args.data_root,
                      self_loop=str2bool(args.self_loop))
    if str2bool(args.use_random_proj):
        # densify + make divisible by num_subnet (train_ist.py:71-84)
        n_comp = (ds.in_feats // args.num_subnet) * args.num_subnet
        ds.random_projection(n_comp, seed=args.rnd_seed)
    # split_input with non-divisible in_feats also rides the virtual
    # padding; random_projection keeps the reference's divisible target
    print(ds.summary())

    cfg = gcn.GCNConfig(
        in_feats=ds.in_feats, n_hidden=args.n_hidden, n_classes=ds.n_classes,
        n_layers=args.n_layers, dropout=args.dropout,
        use_layernorm=str2bool(args.use_layernorm))
    tc = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay, n_epochs=args.n_epochs,
        seed=args.rnd_seed, num_subnet=args.num_subnet,
        iter_per_site=args.iter_per_site,
        split_input=str2bool(args.split_input),
        split_output=str2bool(args.split_output))
    results = train_ist_simulation(ds, cfg, tc, fused=args.fused)
    write_results(results, args.result_json)
    return results


if __name__ == "__main__":
    main()
