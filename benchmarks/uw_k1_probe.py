"""Step-capped feasibility probe for the K=1 ultra-wide *controls* at
h1024/h2048 (VERDICT r3 next-round #2c): the full 40-epoch K=1 run at
these widths is the thing ultra-wide IST exists to avoid, so instead of
burning hours to demonstrate it, measure the K=1 full-width step rate
over short bursts and PROJECT the budget-matched run, alongside the
*measured* K=8 artifact at the same width.

Reference semantics being projected: local epochs = n_epochs // K
(cluster_gcn_ist_distrib.py:385), so the K=1 control runs K x the
device steps of a K=8 run at the same total-epoch budget, every step at
full width (K x wider than a K=8 sub-model) — a ~K^2-ish wall gap at
fixed per-step efficiency, plus the full-width optimizer/activations in
one device's memory.

Projection model (ADVICE r4): per-round fixed costs (dispatch, H2D,
D2H, merge) are measured separately from the burst and NOT multiplied
by 750/STEPS; host batch collection is excluded entirely because the
real trainer overlaps it with the in-flight burst (ist_ultrawide.py's
async dispatch) and a K=1 full-width burst is always the long pole.
    round750_s = fixed_s + 750 * s_per_step
Three rounds run (compile + 2 steady); s_per_step uses the MIN of the
steady rounds and the per-round padded batch bucket shapes are recorded
so a recompile-contaminated sample is detectable.

The epoch budget defaults to the comparator artifact's own recorded
n_epochs (results/{CMP_TAG}_amazon_uw_fullscale_h{H}_k8.json) so the
projection is budget-matched BY CONSTRUCTION; PROBE_BUDGET_EPOCHS
overrides, and the comparator's budget is recorded either way.

Env: UW_HIDDEN (default 2048), PROBE_STEPS (burst length, default 50),
PROBE_BUDGET_EPOCHS (default: read from the comparator), PROBE_TAG
(output filename prefix, default r4), CMP_TAG (comparator prefix,
default = PROBE_TAG), UW_BACKEND=tpu to probe on the real chip via the
sequential single-device burst (default cpu-mesh, the r3/r4 family
backend).  Writes results/{PROBE_TAG}_uw_k1_probe_h{H}.json.
"""
import json
import os
import resource
import time

BACKEND = os.environ.get("UW_BACKEND", "cpu-mesh")
if BACKEND == "cpu-mesh":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
import jax
if BACKEND == "cpu-mesh":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from gist_tpu.data import synthetic_dataset
from gist_tpu.ist.distributed import make_subnet_mesh
from gist_tpu.ist.partition import boundary_sizes
from gist_tpu.ist.ultrawide import (build_local_burst,
                                    build_local_burst_single,
                                    dispatch_host, merge_host,
                                    sample_boundaries_host,
                                    shard_over_subnets)
from gist_tpu.models import sage
from gist_tpu.sampler import ClusterSampler
from gist_tpu.train.ist_cluster import _RoundCollector, _stack_batches

H = int(os.environ.get("UW_HIDDEN", "2048"))
STEPS = int(os.environ.get("PROBE_STEPS", "50"))
TAG = os.environ.get("PROBE_TAG", "r4")
CMP_TAG = os.environ.get("CMP_TAG", TAG)
ITER_PER_SITE = 750          # the recorded family's cadence
K = 1

# budget-matched by construction: default the projected epoch budget to
# whatever the measured K=8 comparator actually ran (ADVICE r4: the
# h1024 probe projected 40 epochs against a 24-epoch artifact)
cmp_path = f"results/{CMP_TAG}_amazon_uw_fullscale_h{H}_k8.json"
cmp_budget = None
if os.path.exists(cmp_path):
    with open(cmp_path) as f:
        cmp_budget = json.load(f).get("config", {}).get("n_epochs")
BUDGET = int(os.environ.get("PROBE_BUDGET_EPOCHS", cmp_budget or 40))

ds = synthetic_dataset("synth-amazon2m")
ds.normalize_features()
cfg = sage.SAGEConfig(ds.in_feats, H, ds.n_classes, n_layers=4,
                      dropout=0.2)
sampler = ClusterSampler(ds, 15000, 10, cache_dir="data", seed=0)
tables = sampler.tables()
collector = _RoundCollector(sampler, STEPS, ids_only=True)

full_params = jax.tree.map(lambda a: np.array(a, copy=True),
                           sage.init(jax.random.PRNGKey(0), cfg))
sub_cfg = cfg.sub_config(split_input=False, split_output=True,
                         num_subnet=K)
sizes = boundary_sizes(cfg.in_feats, cfg.n_hidden, cfg.n_layers,
                       split_input=False, split_output=True)
if BACKEND == "tpu":
    hw = f"{jax.devices()[0].device_kind} x1 (sequential burst)"
    burst_fn = build_local_burst_single(sage, sub_cfg, weight_decay=0.0)
else:
    hw = ("cpu-mesh-8 (accuracy/feasibility probe; the r3/r4 K=8 "
          "family runs the same backend)")
    mesh = make_subnet_mesh(K)
    burst_fn = build_local_burst(sage, sub_cfg, mesh=mesh,
                                 weight_decay=0.0)
host_rng = np.random.default_rng(1)
drop_key = jax.random.PRNGKey(0)

walls, burst_walls, fixed_walls, bucket_shapes = [], [], [], []
for rnd in range(3):             # compile round + 2 steady rounds
    t0 = time.time()
    bnds = sample_boundaries_host(host_rng, sizes, K)
    drop_key, dk = jax.random.split(drop_key)
    batches = _stack_batches(collector.collect())
    # padded bucket shape of the stacked ids (a shape change between
    # rounds means the burst recompiled and that wall is contaminated)
    bucket_shapes.append([list(np.shape(x))
                          for x in jax.tree.leaves(batches)][:2])
    tf0 = time.time()
    if BACKEND == "tpu":
        sub_np = dispatch_host(full_params, bnds, K, "sage")
        sub = jax.tree.map(lambda a: jnp.asarray(a[0]), sub_np)
        jax.block_until_ready(sub)
        tb0 = time.time()
        sub, rl = burst_fn(sub, batches, jnp.asarray(1e-2), dk,
                           jnp.asarray(0), tables)
        jax.block_until_ready(sub)
        tb1 = time.time()
        trained = jax.tree.map(
            lambda a: np.asarray(a)[None], sub)        # D2H
    else:
        shards = shard_over_subnets(mesh, dispatch_host(
            full_params, bnds, K, "sage"))
        jax.block_until_ready(shards)
        tb0 = time.time()
        shards, rl = burst_fn(shards, batches, jnp.asarray(1e-2), dk,
                              tables)
        jax.block_until_ready(shards)
        tb1 = time.time()
        trained = jax.tree.map(np.asarray, shards)     # D2H
    loss = float(np.mean(np.asarray(rl)))
    full_params = merge_host(full_params, bnds, trained, K, "sage")
    t1 = time.time()
    walls.append(t1 - t0)
    burst_walls.append(tb1 - tb0)
    # fixed per-round work: dispatch + H2D + D2H + merge (collection
    # excluded — the trainer overlaps it with the in-flight burst)
    fixed_walls.append((tb0 - tf0) + (t1 - tb1))
    print(f"round {rnd}: wall {walls[-1]:.1f}s burst {burst_walls[-1]:.1f}s "
          f"fixed {fixed_walls[-1]:.1f}s for {STEPS} steps, "
          f"loss {loss:.4f}, bucket {bucket_shapes[-1]}", flush=True)

recompiled = bucket_shapes[1] != bucket_shapes[0] or \
    bucket_shapes[2] != bucket_shapes[1]
steady_s_per_step = min(burst_walls[1:]) / STEPS
fixed_s = float(np.median(fixed_walls))
round750_s = fixed_s + steady_s_per_step * ITER_PER_SITE
# K=1: local epochs = BUDGET, rounds = BUDGET * steps_per_epoch / 750
n_rounds_budget = max(BUDGET * len(sampler) // ITER_PER_SITE, 1)
projected_train_s = round750_s * n_rounds_budget

out = {
    "dataset": ds.name, "n_hidden": H, "num_subnet": K,
    "probe_steps": STEPS, "iter_per_site": ITER_PER_SITE,
    "hardware": hw,
    "round_wall_s": [round(w, 2) for w in walls],
    "burst_wall_s": [round(w, 2) for w in burst_walls],
    "fixed_wall_s": [round(w, 2) for w in fixed_walls],
    "bucket_shapes": bucket_shapes,
    "steady_bucket_recompile_detected": bool(recompiled),
    "s_per_step_full_width": round(steady_s_per_step, 4),
    "fixed_s_per_round": round(fixed_s, 2),
    "projected_round750_s": round(round750_s, 1),
    "budget_epochs": BUDGET,
    "comparator": cmp_path if cmp_budget is not None else None,
    "comparator_budget_epochs": cmp_budget,
    "n_rounds_at_budget": n_rounds_budget,
    "projected_train_s_at_budget": round(projected_train_s, 1),
    "rss_gb": round(resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / 2 ** 20, 2),
    "loadavg_1m": round(os.getloadavg()[0], 2),
    "note": ("projection = fixed_s_per_round + 750 * s_per_step (burst "
             "timed alone, min of two steady rounds; batch collection "
             "excluded — the trainer overlaps it with the burst); "
             "compare against the MEASURED K=8 artifact at the same "
             "width and budget: " + cmp_path),
}
os.makedirs("results", exist_ok=True)
path = f"results/{TAG}_uw_k1_probe_h{H}.json"
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
print("wrote", path, flush=True)
