"""2-D IST x graph-sharding at real scale: synth-reddit-small on the
(subnet=2, graph=4) CPU mesh, trained end-to-end, with a 1-D IST
control (same K, same boundary keys, full-graph steps on a subnet-only
mesh) for accuracy parity and the per-round comm accounting.

The reference's ceiling is "K processes each holding the whole graph"
(cluster_gcn/cluster_gcn_ist_distrib.py:482-517); this composition is
the framework's capstone: hidden width scales over ``subnet`` while the
graph's nodes/edges/activations scale over ``graph``.  Both runs do the
SAME math (K subnets x n_steps full-graph Adam steps per round from the
same dispatch), so their accuracy curves must coincide to float
tolerance — recorded, not assumed.

Env: IST2D_ROUNDS (default 12), IST2D_STEPS (per-round local steps,
default 8), IST2D_HIDDEN (default 128), IST2D_TAG (output prefix,
default r4).  Writes results/{IST2D_TAG}_ist_sharded_2d.json.
"""
import json
import os
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import gist_tpu.graph as G
from gist_tpu.data import synthetic_dataset
from gist_tpu.ist.distributed import build_ist_round, make_subnet_mesh
from gist_tpu.ist.partition import boundary_sizes, sample_boundaries
from gist_tpu.models import sage
from gist_tpu.parallel import build_sharded_graph
from gist_tpu.parallel.graph_shard import shard_features
from gist_tpu.parallel.ist_sharded import (build_ist_sharded_round,
                                           make_ist_graph_mesh)
from gist_tpu.utils import hardware_tag

S, Gd = 2, 4
ROUNDS = int(os.environ.get("IST2D_ROUNDS", "12"))
STEPS = int(os.environ.get("IST2D_STEPS", "8"))
HID = int(os.environ.get("IST2D_HIDDEN", "128"))
TAG = os.environ.get("IST2D_TAG", "r4")
LR = 1e-2

ds = synthetic_dataset("synth-reddit-small")
cfg = sage.SAGEConfig(ds.in_feats, HID, ds.n_classes, n_layers=2,
                      dropout=0.0)
sizes = boundary_sizes(cfg.in_feats, cfg.n_hidden, cfg.n_layers,
                       split_input=False, split_output=True)
full0 = sage.init(jax.random.PRNGKey(0), cfg)

g_flat = G.graph_from_edges(ds.senders, ds.receivers, ds.n_nodes)
x_flat = jnp.asarray(ds.features)


def evaluate(params):
    logits = np.asarray(sage.apply(params, g_flat, x_flat, cfg))
    pred = logits.argmax(-1)
    va = float((pred[ds.val_mask] == ds.labels[ds.val_mask]).mean())
    ta = float((pred[ds.test_mask] == ds.labels[ds.test_mask]).mean())
    return va, ta


# ---- 2-D run: IST(2) x graph(4) --------------------------------------
mesh2 = make_ist_graph_mesh(S, Gd)
sg = build_sharded_graph(ds.senders, ds.receivers, ds.n_nodes, Gd)
xs = shard_features(sg, ds.features, mesh2)
perm = np.asarray(sg.node_perm)
lab = np.zeros(sg.total_rows, np.int32)
lab[perm] = ds.labels
msk = np.zeros(sg.total_rows, bool)
msk[perm] = ds.train_mask
lab, msk = jnp.asarray(lab), jnp.asarray(msk)
round2d = build_ist_sharded_round(sg, mesh2, num_subnet=S,
                                  weight_decay=0.0, n_steps=STEPS)

# ---- 1-D control: IST(2), every subnet holds the whole graph ---------
mesh1 = make_subnet_mesh(S)
sub_cfg = cfg.sub_config(split_input=False, split_output=True,
                         num_subnet=S)
round1d = build_ist_round(sage, sub_cfg, mesh=mesh1, kind="sage",
                          num_subnet=S, weight_decay=0.0,
                          split_input=False)
labels_f = jnp.asarray(ds.labels)
mask_f = jnp.asarray(ds.train_mask)
batches1 = (
    jax.tree.map(lambda a: jnp.broadcast_to(a, (STEPS,) + a.shape), g_flat),
    jnp.broadcast_to(x_flat, (STEPS,) + x_flat.shape),
    jnp.broadcast_to(labels_f, (STEPS,) + labels_f.shape),
    jnp.broadcast_to(mask_f, (STEPS,) + mask_f.shape),
)

key = jax.random.PRNGKey(11)
p2d, p1d = full0, full0
curves = {"2d": {"val": [], "test": [], "wall": []},
          "1d": {"val": [], "test": [], "wall": []}}
for rnd in range(ROUNDS):
    key, pk, dk = jax.random.split(key, 3)
    bnds = sample_boundaries(pk, sizes, S)
    t0 = time.time()
    p2d, l2 = round2d(p2d, bnds, xs, lab, msk, jnp.asarray(LR), dk)
    jax.block_until_ready(p2d)
    curves["2d"]["wall"].append(time.time() - t0)
    t0 = time.time()
    p1d, l1 = round1d(p1d, bnds, batches1, jnp.asarray(LR), dk, None)
    jax.block_until_ready(p1d)
    curves["1d"]["wall"].append(time.time() - t0)
    for tag, p in (("2d", p2d), ("1d", p1d)):
        va, ta = evaluate(p)
        curves[tag]["val"].append(va)
        curves[tag]["test"].append(ta)
    print(f"round {rnd}: 2d val {curves['2d']['val'][-1]:.4f} "
          f"({curves['2d']['wall'][-1]:.1f}s)  1d val "
          f"{curves['1d']['val'][-1]:.4f} "
          f"({curves['1d']['wall'][-1]:.1f}s)", flush=True)

gap = float(np.max(np.abs(np.asarray(curves["2d"]["val"])
                          - np.asarray(curves["1d"]["val"]))))
out = {
    "dataset": ds.name, "mesh": f"subnet={S} x graph={Gd} (8-device CPU)",
    "hidden": HID, "n_layers": 2, "rounds": ROUNDS, "steps_per_round": STEPS,
    "lr": LR, "hardware": hardware_tag(),
    "curves": curves,
    "best_val_2d": max(curves["2d"]["val"]),
    "best_val_1d": max(curves["1d"]["val"]),
    "max_val_gap_2d_vs_1d": gap,
    # comm accounting: one halo exchange per layer per step; layer 0
    # ships in_feats-wide rows, layer 1+ ships hidden-wide rows
    "comm_per_step": {
        "layer0": sg.comm_stats(f=ds.in_feats),
        "layer1": sg.comm_stats(f=HID),
    },
    "ring_shifts_kept": len(sg.ring_shifts),
}
os.makedirs("results", exist_ok=True)
with open(f"results/{TAG}_ist_sharded_2d.json", "w") as f:
    json.dump(out, f, indent=2, default=float)
print(json.dumps({k: out[k] for k in
                  ("best_val_2d", "best_val_1d", "max_val_gap_2d_vs_1d")}),
      flush=True)
print(f"WROTE results/{TAG}_ist_sharded_2d.json", flush=True)
