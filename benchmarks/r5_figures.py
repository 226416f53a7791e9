"""Render round-5 figures from committed result artifacts.

Idempotent: renders whatever r5 artifacts exist and skips the rest, so
it can run mid-round as the chip queue lands artifacts and again at the
end.  Writes results/r5_*.png.

    python benchmarks/r5_figures.py
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


def fig_uw_family_chip():
    """The on-chip ultra-wide family: h2048 K in {2,4,8} + the h512 K=1
    narrow full-width control, all lr 5e-3, all TPU v5 lite x1 via the
    sequential single-device burst (VERDICT r4 next-round #1+#2)."""
    runs = []
    for h, k in ((512, 1), (512, 8), (2048, 1), (2048, 2), (2048, 4),
                 (2048, 8)):
        d = _load(f"r5chip_amazon_uw_fullscale_h{h}_k{k}.json")
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
    ax1.set_title("Amazon2M-scale ultra-wide family ON CHIP "
                  "(TPU v5 lite x1, lr 5e-3)")
    ax1.legend(fontsize=8)
    ax1.grid(alpha=0.3)
    ax2.set_xlabel("train seconds (excl. eval)")
    ax2.set_ylabel("val micro-F1")
    ax2.set_title("time-to-F1 (sequential subnets, one chip)")
    ax2.legend(fontsize=8)
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(R, "r5_amazon_uw_family_chip.png"), dpi=120)
    print("wrote r5_amazon_uw_family_chip.png")


def fig_2d():
    """The re-recorded 2-D vs 1-D comparison under the serial queue
    (VERDICT r4 weak #5: flat walls this time)."""
    d = _load("r5_ist_sharded_2d.json")
    if d is None:
        return
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 3.5))
    rounds = range(len(d["curves"]["2d"]["val"]))
    ax1.plot(rounds, d["curves"]["2d"]["val"], "o-",
             label="2-D (subnet=2 x graph=4)")
    ax1.plot(rounds, d["curves"]["1d"]["val"], "s--",
             label="1-D IST (K=2)")
    ax1.set_xlabel("IST round")
    ax1.set_ylabel("val accuracy")
    ax1.set_title(f"2-D vs 1-D IST ({d['dataset']}, 8-device mesh)")
    ax1.legend()
    ax1.grid(alpha=0.3)
    ax2.plot(rounds, d["curves"]["2d"]["wall"], "o-", label="2-D wall")
    ax2.plot(rounds, d["curves"]["1d"]["wall"], "s--", label="1-D wall")
    ax2.set_xlabel("IST round")
    ax2.set_ylabel("round wall (s)")
    ax2.set_title("round walls under the serial queue")
    ax2.legend()
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(R, "r5_ist_sharded_2d.png"), dpi=120)
    print("wrote r5_ist_sharded_2d.png")


if __name__ == "__main__":
    fig_uw_family_chip()
    fig_2d()
