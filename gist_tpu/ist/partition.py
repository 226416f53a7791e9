"""Random disjoint partition sampling for IST boundaries.

The reference samples partitions two equivalent ways — chunked randperm
(gcn/train_ist.py:150-166) and shuffled round-robin
(cluster_gcn_ist_distrib.py:51-65); both yield a uniformly random
disjoint equal split of ``range(dim)`` into ``num_subnet`` chunks.  Here
it is one reshaped ``jax.random.permutation``, reproducible from a
shared key (so every device in a mesh derives the same partition with
zero communication — no rank-0 sampling + broadcast needed).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


# Padding id for non-divisible partitions.  Gathers translate it to a
# zero fill (jnp.take mode="fill"), scatters drop it (JAX's default
# out-of-bounds scatter mode) — so the index arrays stay rectangular
# (SPMD-uniform sub-model shapes) while covering any dim.  Large enough
# that the SAGE doubled index (idx + in_dim) stays out of bounds too.
VIRTUAL_IDX = 1 << 30


def sample_partition(key: jax.Array, dim: int, num_subnet: int) -> jnp.ndarray:
    """(num_subnet, ceil(dim / num_subnet)) int32 — row s is subnet s's
    disjoint index set; together the rows cover range(dim) exactly.

    Non-divisible dims (the reference's ``torch.chunk`` tolerates
    unequal chunks, gcn/train_ist.py:150-166) pad to equal width with
    ``VIRTUAL_IDX`` entries: every sub-model keeps the same static
    shape (a hard SPMD requirement the torch version doesn't have), the
    virtual units read zero weights at dispatch and their updates are
    dropped at merge.  Divisible dims reproduce the historical
    partition bit-for-bit."""
    c = -(-dim // num_subnet)
    perm = jax.random.permutation(key, num_subnet * c)
    if num_subnet * c != dim:
        perm = jnp.where(perm < dim, perm, VIRTUAL_IDX)
    return perm.reshape(num_subnet, c).astype(jnp.int32)


def boundary_sizes(in_feats: int, n_hidden: int, n_layers: int,
                   *, split_input: bool, split_output: bool) -> List[Optional[int]]:
    """Sizes of each partitioned boundary for a GCN/SAGE stack of
    ``n_layers + 1`` weight layers.

    Boundary b feeds weight-layer b's input:
      b = 0              — input features (split only if split_input)
      b = 1..n_layers-1  — hidden activations (always split)
      b = n_layers       — last hidden boundary (split only if split_output)
    ``None`` marks an unsplit boundary.  Mirrors the feats_idx list built
    at train_ist.py:150-166.
    """
    sizes: List[Optional[int]] = [in_feats if split_input else None]
    for _ in range(1, n_layers):
        sizes.append(n_hidden)
    sizes.append(n_hidden if split_output else None)
    return sizes


def sample_boundaries(
    key: jax.Array,
    sizes: List[Optional[int]],
    num_subnet: int,
) -> Tuple[Optional[jnp.ndarray], ...]:
    """Sample a partition per boundary; ``None`` sizes stay ``None``.
    Returns a tuple aligned with ``boundary_sizes`` output."""
    out = []
    for size in sizes:
        if size is None:
            out.append(None)
        else:
            key, sub = jax.random.split(key)
            out.append(sample_partition(sub, size, num_subnet))
    return tuple(out)
