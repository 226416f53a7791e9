"""Benchmark entry — prints ONE JSON line with the headline metric.

Headline: edges/sec/chip for the SAGE aggregation training step on a
synthetic Reddit-shaped graph (the reference's hot loop, SURVEY.md §3.4)
on the real TPU chip.  ``vs_baseline`` is the fraction of the HBM
roofline (speed-of-light for the gather-dominated SpMM: every edge reads
one F-wide source row), since the reference publishes no numbers
(BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from gist_tpu.data import synthetic_dataset
    from gist_tpu.graph import graph_from_edges
    from gist_tpu.models import sage
    from gist_tpu.models.common import masked_cross_entropy
    from gist_tpu.train.common import make_optimizer

    ds = synthetic_dataset("synth-reddit-small")
    graph = graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
    cfg = sage.SAGEConfig(ds.in_feats, 256, ds.n_classes, n_layers=1,
                          dropout=0.2)
    params = sage.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    opt = make_optimizer(3e-2, 0.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            logits = sage.apply(p, graph, x, cfg, train=True, dropout_key=key)
            return masked_cross_entropy(logits, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    # warm-up/compile
    params, opt_state, loss = step(params, opt_state, key)
    jax.block_until_ready(loss)

    n_iters = 20
    t0 = time.time()
    for i in range(n_iters):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n_iters

    edges_per_sec = graph.n_edges / dt
    # HBM roofline: fwd+bwd SpMM ≈ 4 passes of E*F*4B (fwd layer-0 gather
    # + scatter-grad, plus the layer-1 equivalents at hidden width).
    hbm_bw = 8.1e11  # ~810 GB/s (v5e-class chip)
    bytes_per_edge = 4.0 * (ds.in_feats + cfg.n_hidden) * 4.0 / 2
    sol_eps = hbm_bw / bytes_per_edge
    print(json.dumps({
        "metric": "edges/sec/chip (SAGE train step, synth-reddit-small)",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / sol_eps, 4),
    }))


if __name__ == "__main__":
    main()
