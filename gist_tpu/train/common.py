"""Shared training plumbing: optimizer, LR schedule, result files."""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional

import optax


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-2
    weight_decay: float = 5e-4
    n_epochs: int = 200
    lr_schedule: bool = False   # /10 at 50% and 75% (gcn/train.py:94-100)
    seed: int = 0
    dropout_seed: int = 1234
    # IST knobs
    num_subnet: int = 1
    iter_per_site: int = 5
    split_input: bool = False
    split_output: bool = False


def reference_lr_schedule(base_lr: float, n_epochs: int, epoch: int) -> float:
    """The manual 2-step decay: lr/10 past 50%, /100 past 75% of epochs
    (gcn/train.py:94-100, train_ist.py:193-198)."""
    lr = base_lr
    if epoch >= int(0.5 * n_epochs):
        lr /= 10
    if epoch >= int(0.75 * n_epochs):
        lr /= 10
    return lr


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 term added to the gradient BEFORE
    the moment updates (coupled weight decay — not AdamW's decoupled
    form).  betas=(0.9, 0.999), eps=1e-8 match torch defaults."""
    tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    tx.append(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*tx)


def write_results(results: dict, path: Optional[str]) -> None:
    """JSON result contract replacing the reference's grep-the-last-5-
    stdout-lines protocol (script/reddit/run_ist_sweep_reddit.py:79-96)."""
    if path is None:
        return
    if "hardware" not in results:
        from gist_tpu.utils import hardware_tag
        results = {**results, "hardware": hardware_tag()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=float)


def print_reference_summary(results: dict) -> None:
    """The reference's final stdout lines (ist_distrib.py:475-479)."""
    if "train_time" in results:
        print(f"Training Time: {results['train_time']:.4f}", flush=True)
    if results.get("val_accs"):
        print(f"Last Val: {results['val_accs'][-1]:.4f}", flush=True)
        print(f"Best Val: {max(results['val_accs']):.4f}", flush=True)
    if results.get("test_accs"):
        print(f"Last Test: {results['test_accs'][-1]:.4f}", flush=True)
        print(f"Best Test: {max(results['test_accs']):.4f}", flush=True)
