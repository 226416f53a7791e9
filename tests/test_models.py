"""Model forward passes vs dense numpy oracles of the reference math."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import dense_adj, make_random_graph

import gist_tpu.graph as G
from gist_tpu.models import gcn, sage, gat


def build(rng, n_nodes=30, n_edges=150):
    s, r = make_random_graph(rng, n_nodes, n_edges)
    g = G.graph_from_edges(s, r, n_nodes)
    return g, dense_adj(s, r, n_nodes)


def np_layer_norm(h, eps=1e-5):
    mean = h.mean(axis=-1, keepdims=True)
    var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
    return (h - mean) / np.sqrt(var + eps)


def test_gcn_forward_oracle(rng):
    g, A = build(rng)
    n, in_f, hid, ncls = g.n_nodes, 12, 8, 3
    cfg = gcn.GCNConfig(in_f, hid, ncls, n_layers=2, dropout=0.0)
    params = gcn.init(jax.random.PRNGKey(0), cfg)
    x = rng.standard_normal((n, in_f)).astype(np.float32)

    out = np.asarray(gcn.apply(params, g, jnp.asarray(x), cfg))

    # oracle: h = LN_whole(relu(Ahat h W + b)) per layer, no LN/act on last
    deg_in = A.sum(axis=1)
    deg_out = A.sum(axis=0)
    dn = np.where(deg_in > 0, deg_in ** -0.5, 0.0)
    sn = np.where(deg_out > 0, deg_out ** -0.5, 0.0)
    Ahat = dn[:, None] * A * sn[None, :]
    h = x.astype(np.float64)
    ws = [(np.asarray(l["w"], np.float64), np.asarray(l["b"], np.float64))
          for l in params["layers"]]
    for i, (w, b) in enumerate(ws):
        h = Ahat @ (h @ w) + b
        if i < len(ws) - 1:
            h = np.maximum(h, 0.0)
            mean, var = h.mean(), ((h - h.mean()) ** 2).mean()
            h = (h - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(out, h, rtol=2e-4, atol=2e-4)


def test_sage_forward_oracle(rng):
    g, A = build(rng)
    n, in_f, hid, ncls = g.n_nodes, 10, 6, 4
    cfg = sage.SAGEConfig(in_f, hid, ncls, n_layers=2, dropout=0.0)
    params = sage.init(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((n, in_f)).astype(np.float32)

    out = np.asarray(sage.apply(params, g, jnp.asarray(x), cfg))

    deg = A.sum(axis=1)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    h = x.astype(np.float64)
    layers = params["layers"]
    for i, l in enumerate(layers):
        w = np.asarray(l["w"], np.float64)
        b = np.asarray(l["b"], np.float64)
        ah = (A @ h) * inv[:, None]
        h = np.concatenate([h, ah], axis=1) @ w + b
        if i < len(layers) - 1:
            h = np_layer_norm(h)
            h = np.maximum(h, 0.0)
    np.testing.assert_allclose(out, h, rtol=2e-4, atol=2e-4)


def test_gat_forward_shapes_and_finite(rng):
    g, A = build(rng)
    cfg = gat.GATConfig(in_feats=8, n_hidden=6, n_classes=3, n_layers=3,
                        n_heads=4)
    params = gat.init(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 8)).astype(np.float32))
    out = gat.apply(params, g, x, cfg)
    assert out.shape == (g.n_nodes, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gat_single_head_oracle(rng):
    """1-layer, 1-head GAT vs dense attention oracle."""
    n, in_f, d = 10, 5, 4
    s, r = make_random_graph(rng, n, 30, self_loops=True)
    pairs = np.unique(np.stack([s, r], 1), axis=0)
    s, r = pairs[:, 0], pairs[:, 1]
    g = G.graph_from_edges(s, r, n)
    cfg = gat.GATConfig(in_f, d, d, n_layers=2, n_heads=1)
    params = gat.init(jax.random.PRNGKey(3), cfg)
    x = rng.standard_normal((n, in_f)).astype(np.float32)
    out = np.asarray(gat.apply(params, g, jnp.asarray(x), cfg))

    def leaky(v):
        return np.where(v > 0, v, 0.01 * v)

    def elu(v):
        return np.where(v > 0, v, np.exp(np.minimum(v, 0)) - 1)

    adj = dense_adj(s, r, n) > 0
    h = x.astype(np.float64)
    for l in params["layers"]:
        w = np.asarray(l["w"][0], np.float64)
        attn = np.asarray(l["attn"][0], np.float64)
        z = h @ w
        dd = w.shape[1]
        E = leaky((z @ attn[:dd])[None, :] + (z @ attn[dd:])[:, None])
        E = np.where(adj, E, -np.inf)
        E = E - np.where(adj.any(1, keepdims=True), E.max(1, keepdims=True), 0)
        W = np.where(adj, np.exp(E), 0)
        W = W / np.maximum(W.sum(1, keepdims=True), 1e-38)
        h = elu(W @ z)
    np.testing.assert_allclose(out, h, rtol=1e-3, atol=1e-4)


def test_ist_width_arithmetic():
    from gist_tpu.models.common import ist_layer_dims
    # full model, 2 hidden layers
    assert ist_layer_dims(100, 64, 7, 2) == [(100, 64), (64, 64), (64, 7)]
    # split output, 4 subnets (the distrib setting, ist_distrib.py:87-89)
    assert ist_layer_dims(100, 64, 7, 2, split_output=True, num_subnet=4) == [
        (100, 16), (16, 16), (16, 7)]
    # split input + output
    assert ist_layer_dims(100, 64, 7, 1, split_input=True, split_output=True,
                          num_subnet=4) == [(25, 16), (16, 7)]
    # 1 hidden layer, no split_output: first layer goes to full width
    assert ist_layer_dims(100, 64, 7, 1, num_subnet=4) == [(100, 64), (64, 7)]
    # unsplit output with >1 layers: last hidden expands back to full
    assert ist_layer_dims(100, 64, 7, 3, num_subnet=4) == [
        (100, 16), (16, 16), (16, 64), (64, 7)]


def test_dropout_train_vs_eval(rng):
    g, _ = build(rng)
    cfg = gcn.GCNConfig(6, 8, 3, n_layers=2, dropout=0.5)
    params = gcn.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 6)).astype(np.float32))
    out1 = gcn.apply(params, g, x, cfg)  # eval: deterministic
    out2 = gcn.apply(params, g, x, cfg)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    t1 = gcn.apply(params, g, x, cfg, train=True,
                   dropout_key=jax.random.PRNGKey(7))
    t2 = gcn.apply(params, g, x, cfg, train=True,
                   dropout_key=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_bf16_compute_modes(rng):
    """dtype='bfloat16' runs and stays close to fp32 for GCN and SAGE."""
    g, A = build(rng)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 12)).astype(np.float32))
    for mod, Cfg in [(gcn, gcn.GCNConfig), (sage, sage.SAGEConfig)]:
        cfg32 = Cfg(12, 16, 3, n_layers=1, dropout=0.0)
        from dataclasses import replace
        cfg16 = replace(cfg32, dtype="bfloat16")
        params = mod.init(jax.random.PRNGKey(0), cfg32)
        o32 = np.asarray(mod.apply(params, g, x, cfg32))
        o16 = np.asarray(mod.apply(params, g, x, cfg16))
        assert o16.dtype == np.float32
        scale = np.abs(o32).max() + 1e-6
        assert np.abs(o16 - o32).max() / scale < 0.1, mod.__name__


def test_single_head_gat_layer_fn(rng):
    """layers.gat_layer (the single-head functional primitive) agrees
    with the stacked model's single-head layer."""
    from gist_tpu.models.layers import gat_layer
    from gist_tpu.models.gat import _multi_head_layer
    g, _ = build(rng)
    d_in, d_out = 6, 4
    w = jnp.asarray(rng.standard_normal((d_in, d_out)).astype(np.float32))
    attn = jnp.asarray(rng.standard_normal(2 * d_out).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((g.n_nodes, d_in)).astype(np.float32))
    got = gat_layer(g, x, {"w": w, "attn": attn})
    want = _multi_head_layer(g, x, {"w": w[None], "attn": attn[None]}, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
