"""Step-capped feasibility probe for the K=1 ultra-wide *controls* at
h1024/h2048 (VERDICT r3 next-round #2c): the full 40-epoch K=1 run at
these widths is the thing ultra-wide IST exists to avoid, so instead of
burning hours to demonstrate it, measure the K=1 full-width step rate
over two short bursts (compile round + steady round) and PROJECT the
budget-matched run, alongside the *measured* K=8 artifact at the same
width (results/r4_amazon_uw_fullscale_h{H}_k8.json).

Reference semantics being projected: local epochs = n_epochs // K
(cluster_gcn_ist_distrib.py:385), so the K=1 control runs K x the
device steps of a K=8 run at the same total-epoch budget, every step at
full width (K x wider than a K=8 sub-model) — a ~K^2-ish wall gap at
fixed per-step efficiency, plus the full-width optimizer/activations in
one device's memory.

Env: UW_HIDDEN (default 2048), PROBE_STEPS (burst length, default 50),
PROBE_BUDGET_EPOCHS (default 40, the h2048 K=8 artifact's budget).
Writes results/r4_uw_k1_probe_h{H}.json.
"""
import json
import os
import resource
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from gist_tpu.data import synthetic_dataset
from gist_tpu.ist.distributed import make_subnet_mesh
from gist_tpu.ist.partition import boundary_sizes
from gist_tpu.ist.ultrawide import (build_local_burst, dispatch_host,
                                    merge_host, sample_boundaries_host,
                                    shard_over_subnets)
from gist_tpu.models import sage
from gist_tpu.sampler import ClusterSampler
from gist_tpu.train.ist_cluster import _RoundCollector, _stack_batches

H = int(os.environ.get("UW_HIDDEN", "2048"))
STEPS = int(os.environ.get("PROBE_STEPS", "50"))
BUDGET = int(os.environ.get("PROBE_BUDGET_EPOCHS", "40"))
ITER_PER_SITE = 750          # the recorded family's cadence
K = 1

ds = synthetic_dataset("synth-amazon2m")
ds.normalize_features()
cfg = sage.SAGEConfig(ds.in_feats, H, ds.n_classes, n_layers=4,
                      dropout=0.2)
mesh = make_subnet_mesh(K)
sampler = ClusterSampler(ds, 15000, 10, cache_dir="data", seed=0)
tables = sampler.tables()
collector = _RoundCollector(sampler, STEPS, ids_only=True)

full_params = jax.tree.map(lambda a: np.array(a, copy=True),
                           sage.init(jax.random.PRNGKey(0), cfg))
sub_cfg = cfg.sub_config(split_input=False, split_output=True,
                         num_subnet=K)
sizes = boundary_sizes(cfg.in_feats, cfg.n_hidden, cfg.n_layers,
                       split_input=False, split_output=True)
burst_fn = build_local_burst(sage, sub_cfg, mesh=mesh, weight_decay=0.0)
host_rng = np.random.default_rng(1)
drop_key = jax.random.PRNGKey(0)

walls = []
for rnd in range(2):                       # compile round, steady round
    t0 = time.time()
    bnds = sample_boundaries_host(host_rng, sizes, K)
    shards = shard_over_subnets(mesh, dispatch_host(
        full_params, bnds, K, "sage"))
    drop_key, dk = jax.random.split(drop_key)
    batches = _stack_batches(collector.collect())
    shards, rl = burst_fn(shards, batches, jnp.asarray(1e-2), dk, tables)
    trained = jax.tree.map(np.asarray, shards)    # blocks
    loss = float(np.mean(np.asarray(rl)))
    full_params = merge_host(full_params, bnds, trained, K, "sage")
    walls.append(time.time() - t0)
    print(f"round {rnd}: {walls[-1]:.1f}s for {STEPS} steps, "
          f"loss {loss:.4f}", flush=True)

steady_s_per_step = walls[1] / STEPS
round750_s = steady_s_per_step * ITER_PER_SITE
# K=1: local epochs = BUDGET, rounds = BUDGET * steps_per_epoch / 750
n_rounds_budget = max(BUDGET * len(sampler) // ITER_PER_SITE, 1)
projected_train_s = round750_s * n_rounds_budget

out = {
    "dataset": ds.name, "n_hidden": H, "num_subnet": K,
    "probe_steps": STEPS, "iter_per_site": ITER_PER_SITE,
    "hardware": "cpu-mesh-8 (accuracy/feasibility probe; the recorded "
                "K=8 family runs the same backend)",
    "compile_round_s": round(walls[0], 2),
    "steady_round_s": round(walls[1], 2),
    "s_per_step_full_width": round(steady_s_per_step, 4),
    "projected_round750_s": round(round750_s, 1),
    "budget_epochs": BUDGET,
    "n_rounds_at_budget": n_rounds_budget,
    "projected_train_s_at_budget": round(projected_train_s, 1),
    "rss_gb": round(resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / 2 ** 20, 2),
    "loadavg_1m": round(os.getloadavg()[0], 2),
    "note": ("projection from a measured steady-state burst; compare "
             "against the MEASURED K=8 artifact at the same width "
             "(results/r4_amazon_uw_fullscale_h%d_k8.json)" % H),
}
os.makedirs("results", exist_ok=True)
path = f"results/r4_uw_k1_probe_h{H}.json"
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
print("wrote", path, flush=True)
