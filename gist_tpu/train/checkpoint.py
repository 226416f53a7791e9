"""Checkpoint/resume via orbax — a capability the reference lacks
entirely (SURVEY.md §5: "no model checkpointing at all").

What is persisted: the full-width global params, optimizer step /
round counters, and the partition + dropout PRNG keys, so a resumed
IST run samples the same partition sequence it would have sampled
uninterrupted.
"""

from __future__ import annotations

import os
from typing import Optional



def _ckpt(path: str):
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer(), os.path.abspath(path)


def save_checkpoint(path: str, state: dict) -> None:
    """``state`` is any pytree: {"params": ..., "round": int,
    "part_key": key, "drop_key": key, ...}."""
    import orbax.checkpoint as ocp
    ckptr, path = _ckpt(path)
    ckptr.save(path, state, force=True)


def load_checkpoint(path: str, like: Optional[dict] = None) -> dict:
    """Restore a checkpoint; ``like`` (a template pytree) restores
    arrays with matching dtypes/shardings when provided."""
    import orbax.checkpoint as ocp
    ckptr, path = _ckpt(path)
    if like is not None:
        return ckptr.restore(path, item=like)
    return ckptr.restore(path)


def latest_round_dir(root: str) -> Optional[str]:
    """Find the newest ``round_<k>`` checkpoint directory under root."""
    if not os.path.isdir(root):
        return None
    rounds = []
    for name in os.listdir(root):
        if name.startswith("round_"):
            try:
                rounds.append((int(name.split("_")[1]), name))
            except ValueError:
                pass
    if not rounds:
        return None
    return os.path.join(root, max(rounds)[1])
