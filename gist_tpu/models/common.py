"""Shared model plumbing: width arithmetic, initializers, losses, metrics."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ist_layer_dims(
    in_feats: int,
    n_hidden: int,
    n_classes: int,
    n_layers: int,
    *,
    split_input: bool = False,
    split_output: bool = False,
    num_subnet: int = 1,
) -> List[Tuple[int, int]]:
    """The reference's exact sub-network width arithmetic, shared by the
    GraphConv stack (gcn/gcn.py:27-57) and the SAGE stack
    (cluster_gcn/modules.py:260-308).

    ``n_layers`` counts hidden layers; the stack has ``n_layers + 1``
    weight layers.  With ``num_subnet == 1`` and no splits this is the
    full-width model.
    """
    # ceil: non-divisible widths get equal ceil(dim/K)-wide sub-layers
    # whose trailing units are virtual (ist/partition.py VIRTUAL_IDX) —
    # zero at dispatch, dropped at merge.  Divisible widths unchanged.
    sub_h = -(-n_hidden // num_subnet)
    dims: List[Tuple[int, int]] = []
    first_in = -(-in_feats // num_subnet) if split_input else in_feats
    if n_layers <= 1 and not split_output:
        dims.append((first_in, n_hidden))
    else:
        dims.append((first_in, sub_h))
    for i in range(n_layers - 1):
        if i == n_layers - 2 and not split_output:
            dims.append((sub_h, n_hidden))
        else:
            dims.append((sub_h, sub_h))
    dims.append((sub_h if split_output else n_hidden, n_classes))
    return dims


# ---------------------------------------------------------------------------
# Initializers (matching the reference's torch init distributions)
# ---------------------------------------------------------------------------

def glorot_uniform(key, shape, dtype=jnp.float32):
    """xavier_uniform over (in, out) — DGL GraphConv's weight init."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def xavier_normal_gain(key, shape, gain: float, dtype=jnp.float32):
    """xavier_normal_ with explicit gain (gcn/gat.py:34-37 uses
    calculate_gain('relu') = sqrt(2))."""
    fan_in, fan_out = shape[0], shape[-1]
    std = gain * float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.normal(key, shape, dtype)


def torch_linear_uniform(key, shape, fan_in: int, dtype=jnp.float32):
    """uniform(-stdv, stdv), stdv = 1/sqrt(fan_in) — the SAGE layer init
    (cluster_gcn/modules.py:125-129, 213-216), where fan_in = 2*in."""
    stdv = 1.0 / float(np.sqrt(fan_in))
    return jax.random.uniform(key, shape, dtype, -stdv, stdv)


# ---------------------------------------------------------------------------
# Loss / metrics
# ---------------------------------------------------------------------------

def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over masked nodes — ``CrossEntropyLoss()(
    logits[mask], labels[mask])`` (gcn/train.py:105) without the dynamic
    boolean indexing (static shapes for jit)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    mask = mask.astype(logits.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_bce_multitask(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid BCE over (node, class) cells, meaned over masked cells —
    ``F.binary_cross_entropy_with_logits(logits[mask], labels[mask])``
    (the reference's multitask/PPI loss, cluster_gcn/cluster_gcn.py
    multitask branch) without dynamic boolean indexing."""
    labels = labels.astype(logits.dtype)
    # numerically-stable BCE-with-logits
    bce = (jnp.maximum(logits, 0.0) - logits * labels
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    m = mask.astype(logits.dtype)[:, None]
    denom = jnp.maximum(jnp.sum(m) * logits.shape[-1], 1.0)
    return jnp.sum(bce * m) / denom


def masked_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * mask.astype(jnp.float32)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.0)


def micro_f1(logits: np.ndarray, labels: np.ndarray, mask: np.ndarray,
             multitask: bool = False) -> float:
    """Micro-averaged F1 (cluster_gcn/utils.py:47-57).

    Single-label (default): f1_score(average='micro') on argmax
    predictions, which equals accuracy over the mask.  Multitask:
    labels are (N, C) multi-hot; predictions threshold the logits at 0
    (the reference's ``y_pred[y_pred > 0] = 1``), and micro-F1 is
    ``2TP / (2TP + FP + FN)`` pooled over all (node, class) cells.
    """
    mask = np.asarray(mask).astype(bool)
    if mask.sum() == 0:
        return -1.0
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    if multitask:
        pred = (logits[mask] > 0).astype(np.int64)
        true = (labels[mask] > 0).astype(np.int64)
        tp = int(np.sum(pred * true))
        fp = int(np.sum(pred * (1 - true)))
        fn = int(np.sum((1 - pred) * true))
        denom = 2 * tp + fp + fn
        return float(2 * tp / denom) if denom else 0.0
    pred = np.argmax(logits, axis=-1)
    return float((pred[mask] == labels[mask]).mean())
