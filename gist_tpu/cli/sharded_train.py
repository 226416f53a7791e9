"""Graph-sharded full-graph training CLI — the framework's new scaling
axis (no reference counterpart: every reference rank replicates the
whole graph).  Nodes/edges/features are partitioned across all
available devices; each layer exchanges one boundary halo all_to_all.
"""

import argparse
import time

import numpy as np

from gist_tpu.cli.common import add_common_args, apply_backend, str2bool


def main(argv=None):
    p = argparse.ArgumentParser(description="sharded full-graph SAGE")
    add_common_args(p)
    p.add_argument("--n-devices", type=int, default=None,
                   help="devices to shard over (default: all)")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--use-f1", action="store_true")
    p.add_argument("--halo-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="wire dtype for the ring halo exchange; "
                        "bfloat16 halves ICI bytes at fp32 compute")
    args = p.parse_args(argv)
    apply_backend(args)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gist_tpu.data import load_dataset
    from gist_tpu.models import sage
    from gist_tpu.models.common import micro_f1
    from gist_tpu.parallel import build_sharded_graph
    from gist_tpu.parallel.graph_shard import shard_features, unshard
    from gist_tpu.parallel.train import (build_sharded_sage_infer,
                                         build_sharded_sage_step)
    from gist_tpu.train.common import write_results

    ds = load_dataset(args.dataset, args.data_root)
    if args.normalize:
        ds.normalize_features()
    print(ds.summary())

    d = args.n_devices or jax.device_count()
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
    print(f"sharded over {d} devices: n_loc_pad={sg.n_loc_pad} "
          f"halo_pad={sg.halo_pad} "
          f"(halo/replication ratio "
          f"{d * sg.halo_pad / max(ds.n_nodes, 1):.3f})")

    xs = shard_features(sg, ds.features, mesh)
    perm = np.asarray(sg.node_perm)
    lab = np.zeros(sg.total_rows, np.int32)
    lab[perm] = ds.labels
    msk = np.zeros(sg.total_rows, bool)
    msk[perm] = ds.train_mask
    labels_sh = jnp.asarray(lab)
    mask_sh = jnp.asarray(msk)

    cfg = sage.SAGEConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                          n_layers=args.n_layers, dropout=0.0,
                          use_layernorm=str2bool(args.use_layernorm))
    params = sage.init(jax.random.PRNGKey(args.rnd_seed), cfg)
    hdt = jnp.bfloat16 if args.halo_dtype == "bfloat16" else None
    init_opt, step = build_sharded_sage_step(
        sg, mesh, lr=args.lr, weight_decay=args.weight_decay,
        use_layernorm=str2bool(args.use_layernorm), halo_dtype=hdt)
    infer = build_sharded_sage_infer(
        sg, mesh, use_layernorm=str2bool(args.use_layernorm))
    opt_state = init_opt(params)

    def evaluate(params):
        logits = np.asarray(unshard(sg, infer(params, xs)))
        if args.use_f1:
            return (micro_f1(logits, ds.labels, ds.val_mask),
                    micro_f1(logits, ds.labels, ds.test_mask))
        pred = logits.argmax(-1)
        va = float((pred[ds.val_mask] == ds.labels[ds.val_mask]).mean())
        ta = float((pred[ds.test_mask] == ds.labels[ds.test_mask]).mean())
        return va, ta

    total = 0.0
    val_accs, test_accs, losses = [], [], []
    for epoch in range(args.n_epochs):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, xs, labels_sh,
                                       mask_sh)
        jax.block_until_ready(loss)
        if epoch >= 3:
            total += time.time() - t0
        losses.append(float(loss))
        va, ta = evaluate(params)
        val_accs.append(va)
        test_accs.append(ta)

    eps = ds.n_edges * max(args.n_epochs - 3, 1) / total if total else 0.0
    results = {
        "dataset": ds.name, "n_devices": d, "train_time": total,
        "edges_per_sec": eps, "edges_per_sec_per_chip": eps / d,
        "final_test_acc": test_accs[-1], "best_val_acc": max(val_accs),
        "best_test_acc": max(test_accs), "val_accs": val_accs,
        "test_accs": test_accs, "losses": losses,
    }
    print(f"Training Time: {total:.4f}")
    print(f"Best Val: {max(val_accs):.4f}")
    print(f"Best Test: {max(test_accs):.4f}")
    print(f"edges/sec: {eps:.0f}")
    write_results(results, args.result_json)
    return results


if __name__ == "__main__":
    main()
