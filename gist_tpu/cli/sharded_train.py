"""Graph-sharded full-graph training CLI — the framework's new scaling
axis (no reference counterpart: every reference rank replicates the
whole graph).  Nodes/edges/features are partitioned across all
available devices; each layer exchanges one ring boundary halo.
``--model`` selects the family: sage (mean-agg concat), gcn (symmetric
norm + whole-tensor LN, self-loops added like gcn/train.py:64-70), or
gat (multi-head edge attention, softmax local to the receiver shard).
"""

import argparse
import time

import numpy as np

from gist_tpu.cli.common import add_common_args, apply_backend, str2bool


def main(argv=None):
    p = argparse.ArgumentParser(description="sharded full-graph GNN")
    add_common_args(p)
    p.add_argument("--model", choices=["sage", "gcn", "gat"],
                   default="sage")
    p.add_argument("--n-heads", type=int, default=2,
                   help="GAT attention heads")
    p.add_argument("--n-devices", type=int, default=None,
                   help="devices to shard over (default: all)")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--use-f1", action="store_true")
    p.add_argument("--halo-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="wire dtype for the ring halo exchange; "
                        "bfloat16 halves ICI bytes at fp32 compute")
    p.add_argument("--ist-subnets", type=int, default=1,
                   help="> 1 trains on the 2-D (subnet, graph) mesh: "
                        "IST hidden-width sharding composed with graph "
                        "sharding, any --model family; devices = "
                        "subnets x graph shards")
    p.add_argument("--iter_per_site", type=int, default=8,
                   help="local full-graph steps per IST round "
                        "(2-D mode; --n-epochs counts rounds there)")
    args = p.parse_args(argv)
    apply_backend(args)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gist_tpu.data import load_dataset
    from gist_tpu.models import gat, gcn, sage
    from gist_tpu.models.common import micro_f1
    from gist_tpu.parallel import build_sharded_graph
    from gist_tpu.parallel.graph_shard import shard_features, unshard
    from gist_tpu.parallel.train import (build_sharded_infer,
                                         build_sharded_step)
    from gist_tpu.train.common import write_results

    ds = load_dataset(args.dataset, args.data_root)
    if args.normalize:
        ds.normalize_features()
    print(ds.summary())

    senders, receivers = ds.senders, ds.receivers
    if args.model == "gcn":
        # the reference GCN trains with self-loops (gcn/train.py:64-70)
        loops = np.arange(ds.n_nodes)
        senders = np.concatenate([senders, loops])
        receivers = np.concatenate([receivers, loops])

    d = args.n_devices or jax.device_count()
    if args.ist_subnets > 1:
        # senders/receivers carry the GCN self-loops added above
        return _main_2d(args, ds, d, senders, receivers)
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    sg = build_sharded_graph(senders, receivers, ds.n_nodes, d)
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

    use_ln = str2bool(args.use_layernorm)
    dropout = 0.0
    if args.model == "sage":
        cfg = sage.SAGEConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                              n_layers=args.n_layers, dropout=0.0,
                              use_layernorm=use_ln)
        params = sage.init(jax.random.PRNGKey(args.rnd_seed), cfg)
    elif args.model == "gcn":
        dropout = args.dropout
        cfg = gcn.GCNConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                            n_layers=args.n_layers, dropout=dropout,
                            use_layernorm=use_ln)
        params = gcn.init(jax.random.PRNGKey(args.rnd_seed), cfg)
    else:
        cfg = gat.GATConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                            n_layers=max(args.n_layers, 2),
                            n_heads=args.n_heads)
        params = gat.init(jax.random.PRNGKey(args.rnd_seed), cfg)
    hdt = jnp.bfloat16 if args.halo_dtype == "bfloat16" else None
    init_opt, step = build_sharded_step(
        sg, mesh, kind=args.model, lr=args.lr,
        weight_decay=args.weight_decay, use_layernorm=use_ln,
        halo_dtype=hdt, dropout=dropout)
    # eval runs the SAME wire numerics as training (halo_dtype plumbed)
    infer = build_sharded_infer(sg, mesh, kind=args.model,
                                use_layernorm=use_ln, halo_dtype=hdt)
    opt_state = init_opt(params)
    drop_key = jax.random.PRNGKey(args.rnd_seed + 1)

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
        if dropout > 0:
            drop_key, dk = jax.random.split(drop_key)
            params, opt_state, loss = step(params, opt_state, xs,
                                           labels_sh, mask_sh, dk)
        else:
            params, opt_state, loss = step(params, opt_state, xs,
                                           labels_sh, mask_sh)
        jax.block_until_ready(loss)
        if epoch >= 3:
            total += time.time() - t0
        losses.append(float(loss))
        va, ta = evaluate(params)
        val_accs.append(va)
        test_accs.append(ta)

    eps = ds.n_edges * max(args.n_epochs - 3, 1) / total if total else 0.0
    results = {
        "dataset": ds.name, "model": args.model, "n_devices": d,
        "train_time": total,
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


def _main_2d(args, ds, d, senders, receivers):
    """2-D (subnet, graph) training: IST rounds whose local steps run
    the graph-sharded forward of the requested family (sage | gcn |
    gat — GAT-IST semantics per ist_distrib_gat.py:96-205).
    --n-epochs counts ROUNDS; each round does --iter_per_site
    full-graph steps per subnet, then one all_gather sync merge.  Eval
    runs the merged full-width model on the flat graph host-side (fine
    at CPU-mesh scales; large graphs should eval through the sharded
    infer instead).  ``senders``/``receivers`` carry the GCN
    self-loops added by main()."""
    import time

    import jax
    import jax.numpy as jnp

    import gist_tpu.graph as G
    from gist_tpu.ist.partition import boundary_sizes, sample_boundaries
    from gist_tpu.models import gat, gcn, sage
    from gist_tpu.models.common import micro_f1
    from gist_tpu.parallel import build_sharded_graph
    from gist_tpu.parallel.graph_shard import shard_features
    from gist_tpu.parallel.ist_sharded import (build_ist_sharded_round,
                                               make_ist_graph_mesh)
    from gist_tpu.train.common import write_results

    S = args.ist_subnets
    if d % S:
        raise SystemExit(f"--n-devices {d} not divisible by "
                         f"--ist-subnets {S}")
    Gd = d // S
    use_ln = str2bool(args.use_layernorm)
    mesh = make_ist_graph_mesh(S, Gd)
    sg = build_sharded_graph(senders, receivers, ds.n_nodes, Gd)
    print(f"2-D mesh: subnet={S} x graph={Gd}; n_loc_pad={sg.n_loc_pad}")

    xs = shard_features(sg, ds.features, mesh)
    perm = np.asarray(sg.node_perm)
    lab = np.zeros(sg.total_rows, np.int32)
    lab[perm] = ds.labels
    msk = np.zeros(sg.total_rows, bool)
    msk[perm] = ds.train_mask
    lab, msk = jnp.asarray(lab), jnp.asarray(msk)

    if args.model == "sage":
        model = sage
        cfg = sage.SAGEConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                              n_layers=args.n_layers, dropout=0.0,
                              use_layernorm=use_ln)
    elif args.model == "gcn":
        model = gcn
        cfg = gcn.GCNConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                            n_layers=args.n_layers, dropout=0.0,
                            use_layernorm=use_ln)
    else:
        model = gat
        cfg = gat.GATConfig(ds.in_feats, args.n_hidden, ds.n_classes,
                            n_layers=max(args.n_layers, 2),
                            n_heads=args.n_heads)
    full = model.init(jax.random.PRNGKey(args.rnd_seed), cfg)
    # GAT never splits the last hidden boundary (ist_distrib_gat.py:
    # 88-94) — its shared last-layer attention would train against
    # disjoint halves and the merged model regresses
    sizes = boundary_sizes(cfg.in_feats, cfg.n_hidden, cfg.n_layers,
                           split_input=False,
                           split_output=args.model != "gat")
    hdt = jnp.bfloat16 if args.halo_dtype == "bfloat16" else None
    round_fn = build_ist_sharded_round(
        sg, mesh, num_subnet=S, kind=args.model,
        weight_decay=args.weight_decay,
        use_layernorm=use_ln, n_steps=args.iter_per_site, halo_dtype=hdt)

    g_flat = G.graph_from_edges(senders, receivers, ds.n_nodes)
    x_flat = jnp.asarray(ds.features)

    def evaluate(params):
        logits = np.asarray(model.apply(params, g_flat, x_flat, cfg))
        if args.use_f1:
            return (micro_f1(logits, ds.labels, ds.val_mask),
                    micro_f1(logits, ds.labels, ds.test_mask))
        pred = logits.argmax(-1)
        va = float((pred[ds.val_mask] == ds.labels[ds.val_mask]).mean())
        ta = float((pred[ds.test_mask] == ds.labels[ds.test_mask]).mean())
        return va, ta

    key = jax.random.PRNGKey(args.rnd_seed + 1)
    total = 0.0
    val_accs, test_accs, losses = [], [], []
    for rnd in range(args.n_epochs):
        key, pk, dk = jax.random.split(key, 3)
        bnds = sample_boundaries(pk, sizes, S)
        t0 = time.time()
        full, rl = round_fn(full, bnds, xs, lab, msk,
                            jnp.asarray(args.lr), dk)
        jax.block_until_ready(full)
        total += time.time() - t0
        losses.append(float(np.mean(np.asarray(rl))))
        va, ta = evaluate(full)
        val_accs.append(va)
        test_accs.append(ta)
        print(f"round {rnd}: loss {losses[-1]:.4f} val {va:.4f}",
              flush=True)

    results = {
        "dataset": ds.name, "model": args.model, "mesh_2d": [S, Gd],
        "n_devices": d, "iter_per_site": args.iter_per_site,
        "train_time": total, "final_test_acc": test_accs[-1],
        "best_val_acc": max(val_accs), "best_test_acc": max(test_accs),
        "val_accs": val_accs, "test_accs": test_accs, "losses": losses,
        "comm_per_step_layer0": sg.comm_stats(f=ds.in_feats),
    }
    print(f"Training Time: {total:.4f}")
    print(f"Best Val: {max(val_accs):.4f}")
    print(f"Best Test: {max(test_accs):.4f}")
    write_results(results, args.result_json)
    return results


if __name__ == "__main__":
    main()
