"""Inference driver: load a training checkpoint, run full-graph
inference, report metrics and (optionally) dump logits.

The serving-side counterpart of the trainers: the reference has no
inference entry point at all (eval is inlined in each trainer) — this
provides checkpoint -> predictions as a standalone flow, on the
accelerator or (--cpu) on the host for models wider than HBM.
"""

import argparse

import numpy as np

from gist_tpu.cli.common import add_common_args, apply_backend, str2bool


def main(argv=None):
    p = argparse.ArgumentParser(description="gist_tpu inference")
    add_common_args(p)
    p.add_argument("--checkpoint-dir", type=str, required=True)
    p.add_argument("--model", type=str, default="sage",
                   choices=["sage", "gcn", "gat"])
    p.add_argument("--n-heads", type=int, default=2)
    p.add_argument("--use-f1", action="store_true")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="run inference on the host (ultra-wide models)")
    p.add_argument("--logits-out", type=str, default=None,
                   help="save logits to this .npy path")
    args = p.parse_args(argv)
    apply_backend(args)

    import jax
    import jax.numpy as jnp

    from gist_tpu.data import load_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.models import gat, gcn, sage
    from gist_tpu.models.common import micro_f1
    from gist_tpu.train.checkpoint import latest_round_dir, load_checkpoint
    from gist_tpu.train.common import write_results

    ds = load_dataset(args.dataset, args.data_root)
    if args.normalize:
        ds.normalize_features()

    ck = latest_round_dir(args.checkpoint_dir) or args.checkpoint_dir
    state = load_checkpoint(ck)
    params = state["params"] if "params" in state else state
    print(f"loaded {ck}")

    mod = {"sage": sage, "gcn": gcn, "gat": gat}[args.model]
    if args.model == "gat":
        cfg = gat.GATConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                            n_layers=max(args.n_layers, 2),
                            n_heads=args.n_heads)
    else:
        Cfg = sage.SAGEConfig if args.model == "sage" else gcn.GCNConfig
        cfg = Cfg(ds.in_feats, args.n_hidden, ds.n_classes,
                  n_layers=args.n_layers,
                  use_layernorm=str2bool(args.use_layernorm))

    device = jax.devices("cpu")[0] if args.cpu else jax.devices()[0]
    with jax.default_device(device):
        graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
        p_dev = jax.device_put(params, device)
        logits = mod.apply(p_dev, graph, jnp.asarray(ds.features), cfg)
        logits = np.asarray(logits)

    results = {"checkpoint": ck, "dataset": ds.name}
    if ds.labels_multi is not None:
        # multitask (ppi): threshold-at-0 micro-F1 on the multi-hot
        # matrix (cluster_gcn/utils.py:47-57)
        results["val"] = micro_f1(logits, ds.labels_multi, ds.val_mask,
                                  multitask=True)
        results["test"] = micro_f1(logits, ds.labels_multi, ds.test_mask,
                                   multitask=True)
    elif args.use_f1:
        results["val"] = micro_f1(logits, ds.labels, ds.val_mask)
        results["test"] = micro_f1(logits, ds.labels, ds.test_mask)
    else:
        pred = logits.argmax(-1)
        results["val"] = float(
            (pred[ds.val_mask] == ds.labels[ds.val_mask]).mean())
        results["test"] = float(
            (pred[ds.test_mask] == ds.labels[ds.test_mask]).mean()) \
            if ds.test_mask.any() else results["val"]
    print(f"Val: {results['val']:.4f}  Test: {results['test']:.4f}")
    if args.logits_out:
        np.save(args.logits_out, logits)
        results["logits_out"] = args.logits_out
    write_results(results, args.result_json)
    return results


if __name__ == "__main__":
    main()
