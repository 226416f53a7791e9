"""Render round-4 figures from committed result artifacts.

Idempotent: renders whatever r4 artifacts exist and skips the rest, so
it can run mid-round (2-D comparison) and again once the ultra-wide
family lands.  Writes results/r4_*.png.

    python benchmarks/r4_figures.py
"""

import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

R = os.path.join(os.path.dirname(__file__), "..", "results")


def _load(name):
    p = os.path.join(R, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def fig_2d():
    d = _load("r4_ist_sharded_2d.json")
    if d is None:
        return
    fig, ax = plt.subplots(figsize=(5.5, 3.5))
    rounds = range(len(d["curves"]["2d"]["val"]))
    ax.plot(rounds, d["curves"]["2d"]["val"], "o-",
            label="2-D (subnet=2 x graph=4)")
    ax.plot(rounds, d["curves"]["1d"]["val"], "s--",
            label="1-D IST (K=2)")
    ax.set_xlabel("IST round")
    ax.set_ylabel("val accuracy")
    ax.set_title("2-D IST x graph sharding vs 1-D IST "
                 f"({d['dataset']}, 8-device mesh)")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(R, "r4_ist_sharded_2d.png"), dpi=120)
    print("wrote r4_ist_sharded_2d.png")


def fig_uw_family():
    runs = []
    for h in (512, 1024, 2048):
        for k in (1, 8):
            d = _load(f"r4_amazon_uw_fullscale_h{h}_k{k}.json")
            if d is not None:
                runs.append((h, k, d))
    if not runs:
        return
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 3.8))
    for h, k, d in runs:
        evals = d.get("eval_rounds", range(len(d["val_accs"])))
        style = "-" if k > 1 else "--"
        ax1.plot(list(evals), d["val_accs"], style, marker="o",
                 label=f"h{h} K={k}")
        tt = d.get("train_time_at_eval")
        if tt:
            ax2.plot(tt, d["val_accs"], style, marker="o",
                     label=f"h{h} K={k}")
    ax1.set_xlabel("IST round")
    ax1.set_ylabel("val micro-F1")
    ax1.set_title("Amazon2M ultra-wide family (2.45M nodes)")
    ax1.legend(fontsize=8)
    ax1.grid(alpha=0.3)
    ax2.set_xlabel("train seconds (excl. eval)")
    ax2.set_ylabel("val micro-F1")
    ax2.set_title("time-to-F1")
    ax2.legend(fontsize=8)
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(R, "r4_amazon_uw_family.png"), dpi=120)
    print("wrote r4_amazon_uw_family.png")


def fig_sharded_models():
    fig, ax = plt.subplots(figsize=(5.5, 3.5))
    any_ = False
    for model, fname in (("GCN", "r4_sharded_gcn_reddit.json"),
                         ("GAT", "r4_sharded_gat_reddit.json")):
        d = _load(fname)
        if d is None:
            continue
        any_ = True
        ax.plot(range(len(d["val_accs"])), d["val_accs"],
                label=f"sharded {model} (D=8), best "
                      f"{d['best_val_acc']:.3f}")
    if not any_:
        return
    ax.set_xlabel("epoch")
    ax.set_ylabel("val accuracy")
    ax.set_title("Graph-sharded GCN/GAT training (synth-reddit-small)")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(R, "r4_sharded_models.png"), dpi=120)
    print("wrote r4_sharded_models.png")


if __name__ == "__main__":
    fig_2d()
    fig_uw_family()
    fig_sharded_models()
