"""Sharded full-graph SAGE training == single-device training."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from conftest import make_random_graph

import gist_tpu.graph as G
from gist_tpu.data import synthetic_dataset
from gist_tpu.models import sage
from gist_tpu.models.common import masked_accuracy, masked_cross_entropy
from gist_tpu.parallel import build_sharded_graph
from gist_tpu.parallel.graph_shard import shard_features, unshard
from gist_tpu.parallel.train import (build_sharded_sage_infer,
                                     build_sharded_sage_step)
from gist_tpu.train.common import make_optimizer
import optax


def test_sharded_step_matches_single_device():
    ds = synthetic_dataset("synth-tiny")
    d = 4
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    params = sage.init(jax.random.PRNGKey(0), cfg)

    # sharded data
    xs = shard_features(sg, ds.features, mesh)
    perm = np.asarray(sg.node_perm)
    lab = np.zeros(sg.total_rows, np.int32)
    lab[perm] = ds.labels
    msk = np.zeros(sg.total_rows, bool)
    msk[perm] = ds.train_mask
    labels_sh = jnp.asarray(lab)
    mask_sh = jnp.asarray(msk)

    init_opt, step = build_sharded_sage_step(sg, mesh, lr=1e-2,
                                             weight_decay=0.0)
    opt_state = init_opt(params)
    p_sh = params
    losses_sh = []
    for _ in range(3):
        p_sh, opt_state, loss = step(p_sh, opt_state, xs, labels_sh, mask_sh)
        losses_sh.append(float(loss))

    # single-device reference (same math, no dropout)
    g = G.graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    opt = make_optimizer(1e-2, 0.0)
    st = opt.init(params)
    p = params
    losses = []
    for _ in range(3):
        def loss_fn(pp):
            logits = sage.apply(pp, g, x, cfg)
            return masked_cross_entropy(logits, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, st = opt.update(grads, st, p)
        p = optax.apply_updates(p, upd)
        losses.append(float(loss))

    np.testing.assert_allclose(losses_sh, losses, rtol=1e-4)
    # reduction-order differences (psum vs single-device sum) get
    # amplified through Adam's rsqrt; compare with an absolute floor
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-4),
        p_sh, p)

    # sharded inference matches too
    infer = build_sharded_sage_infer(sg, mesh)
    got = unshard(sg, infer(p_sh, xs))
    want = sage.apply(p, g, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)
    acc = masked_accuracy(got, labels, mask)
    assert np.isfinite(float(acc))


def test_sharded_step_bf16_halo_trains():
    """halo_dtype=bf16 (wire compression, fp32 compute) stays close to
    the fp32-wire sharded step over a few training steps."""
    ds = synthetic_dataset("synth-tiny")
    d = 4
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
    cfg = sage.SAGEConfig(ds.in_feats, 16, ds.n_classes, n_layers=1,
                          dropout=0.0)
    params = sage.init(jax.random.PRNGKey(0), cfg)
    xs = shard_features(sg, ds.features, mesh)
    perm = np.asarray(sg.node_perm)
    lab = np.zeros(sg.total_rows, np.int32)
    lab[perm] = ds.labels
    msk = np.zeros(sg.total_rows, bool)
    msk[perm] = ds.train_mask
    labels_sh, mask_sh = jnp.asarray(lab), jnp.asarray(msk)

    losses = {}
    for tag, hdt in (("fp32", None), ("bf16", jnp.bfloat16)):
        init_opt, step = build_sharded_sage_step(sg, mesh, lr=1e-2,
                                                 weight_decay=0.0,
                                                 halo_dtype=hdt)
        p, st = params, init_opt(params)
        ls = []
        for _ in range(4):
            p, st, loss = step(p, st, xs, labels_sh, mask_sh)
            ls.append(float(loss))
        losses[tag] = ls
    np.testing.assert_allclose(losses["bf16"], losses["fp32"],
                               rtol=5e-2, atol=5e-2)


def _shard_labels(sg, ds):
    perm = np.asarray(sg.node_perm)
    lab = np.zeros(sg.total_rows, np.int32)
    lab[perm] = ds.labels
    msk = np.zeros(sg.total_rows, bool)
    msk[perm] = ds.train_mask
    return jnp.asarray(lab), jnp.asarray(msk)


def test_sharded_gcn_matches_single_device():
    """Graph-sharded GCN (symmetric norm + whole-tensor LN via psum)
    trains identically to the flat models/gcn stack."""
    from gist_tpu.models import gcn
    from gist_tpu.parallel.train import build_sharded_infer, \
        build_sharded_step

    ds = synthetic_dataset("synth-tiny")
    d = 4
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    # GCN parity includes self-loops, like the reference (train.py:64-70)
    s = np.concatenate([ds.senders, np.arange(ds.n_nodes)])
    r = np.concatenate([ds.receivers, np.arange(ds.n_nodes)])
    sg = build_sharded_graph(s, r, ds.n_nodes, d)
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        dropout=0.0)
    params = gcn.init(jax.random.PRNGKey(0), cfg)
    xs = shard_features(sg, ds.features, mesh)
    labels_sh, mask_sh = _shard_labels(sg, ds)

    init_opt, step = build_sharded_step(sg, mesh, kind="gcn", lr=1e-2,
                                        weight_decay=0.0)
    p_sh, st = params, init_opt(params)
    losses_sh = []
    for _ in range(3):
        p_sh, st, loss = step(p_sh, st, xs, labels_sh, mask_sh)
        losses_sh.append(float(loss))

    g = G.graph_from_edges(s, r, ds.n_nodes)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    opt = make_optimizer(1e-2, 0.0)
    p, st2 = params, None
    st2 = opt.init(params)
    losses = []
    for _ in range(3):
        def loss_fn(pp):
            logits = gcn.apply(pp, g, x, cfg)
            return masked_cross_entropy(logits, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, st2 = opt.update(grads, st2, p)
        p = optax.apply_updates(p, upd)
        losses.append(float(loss))

    np.testing.assert_allclose(losses_sh, losses, rtol=1e-4)
    infer = build_sharded_infer(sg, mesh, kind="gcn")
    got = unshard(sg, infer(p_sh, xs))
    want = gcn.apply(p, g, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=3e-4)


def test_sharded_gat_matches_single_device():
    """Graph-sharded GAT: the per-dst softmax stays local (cut-edge
    scores ride the halo with their sender rows) and must reproduce the
    flat models/gat forward + a few training steps."""
    from gist_tpu.models import gat
    from gist_tpu.parallel.train import build_sharded_infer, \
        build_sharded_step

    ds = synthetic_dataset("synth-tiny")
    d = 4
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
    cfg = gat.GATConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        n_heads=2)
    params = gat.init(jax.random.PRNGKey(0), cfg)
    xs = shard_features(sg, ds.features, mesh)
    labels_sh, mask_sh = _shard_labels(sg, ds)

    init_opt, step = build_sharded_step(sg, mesh, kind="gat", lr=1e-2,
                                        weight_decay=0.0)
    p_sh, st = params, init_opt(params)
    losses_sh = []
    for _ in range(3):
        p_sh, st, loss = step(p_sh, st, xs, labels_sh, mask_sh)
        losses_sh.append(float(loss))

    g = G.graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    opt = make_optimizer(1e-2, 0.0)
    p = params
    st2 = opt.init(params)
    losses = []
    for _ in range(3):
        def loss_fn(pp):
            logits = gat.apply(pp, g, x, cfg, backend="segment")
            return masked_cross_entropy(logits, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, st2 = opt.update(grads, st2, p)
        p = optax.apply_updates(p, upd)
        losses.append(float(loss))

    np.testing.assert_allclose(losses_sh, losses, rtol=1e-4)
    infer = build_sharded_infer(sg, mesh, kind="gat")
    got = unshard(sg, infer(p_sh, xs))
    want = gat.apply(p, g, x, cfg, backend="segment")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=3e-4)


def test_sharded_gcn_dropout_trains():
    """GCN sharded step with dropout>0: loss decreases and stays finite
    (per-device RNG streams fold in the mesh position)."""
    from gist_tpu.models import gcn
    from gist_tpu.parallel.train import build_sharded_step

    ds = synthetic_dataset("synth-tiny")
    d = 4
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
    cfg = gcn.GCNConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        dropout=0.5)
    params = gcn.init(jax.random.PRNGKey(0), cfg)
    xs = shard_features(sg, ds.features, mesh)
    labels_sh, mask_sh = _shard_labels(sg, ds)

    init_opt, step = build_sharded_step(sg, mesh, kind="gcn", lr=1e-2,
                                        weight_decay=0.0, dropout=0.5)
    p, st = params, init_opt(params)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(6):
        key, dk = jax.random.split(key)
        p, st, loss = step(p, st, xs, labels_sh, mask_sh, dk)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sharded_gat_interior_dedup_kernel_matches_segments():
    """Round 4: interior edges through the dedup attention kernel's
    partial softmax, merged with boundary segment partials — must
    reproduce the segment-only sharded forward AND its gradients
    (the hybrid backward recomputes the exact segment math)."""
    from jax.experimental.pallas import tpu as pltpu

    from gist_tpu.models import gat
    from gist_tpu.parallel.train import build_sharded_infer, \
        build_sharded_step

    ds = synthetic_dataset("synth-tiny")
    d = 4
    mesh = Mesh(np.asarray(jax.devices()[:d]), ("graph",))
    sg_k = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d,
                               interior_tiles=True)
    assert sg_k.int_dedup is not None
    sg_s = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, d)
    cfg = gat.GATConfig(ds.in_feats, 16, ds.n_classes, n_layers=2,
                        n_heads=2)
    params = gat.init(jax.random.PRNGKey(0), cfg)
    xs = shard_features(sg_k, ds.features, mesh)
    labels_sh, mask_sh = _shard_labels(sg_k, ds)

    def run(sg, interpret):
        init_opt, step = build_sharded_step(sg, mesh, kind="gat",
                                            lr=1e-2, weight_decay=0.0)
        p_sh, st = params, init_opt(params)
        losses = []
        ctx = pltpu.force_tpu_interpret_mode() if interpret else \
            __import__("contextlib").nullcontext()
        with ctx:
            for _ in range(3):
                p_sh, st, loss = step(p_sh, st, xs, labels_sh, mask_sh)
                losses.append(float(loss))
            infer = build_sharded_infer(sg, mesh, kind="gat")
            out = np.asarray(unshard(sg, infer(p_sh, xs)))
        return losses, out

    losses_k, out_k = run(sg_k, interpret=True)
    losses_s, out_s = run(sg_s, interpret=False)
    np.testing.assert_allclose(losses_k, losses_s, rtol=2e-3)
    np.testing.assert_allclose(out_k, out_s, rtol=2e-2, atol=2e-3)
