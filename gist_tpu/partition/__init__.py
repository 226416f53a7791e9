"""Graph clustering for Cluster-GCN mini-batching.

The reference delegates to METIS through DGL (partition_utils.py:11-18).
Without DGL, this package provides:

* :mod:`gist_tpu.partition.greedy` — pure-numpy BFS graph-growing
  partitioner (the classic Kernighan "graph growing" heuristic METIS
  itself uses for initial partitions) — always available.
* :mod:`gist_tpu.partition.native` — the same algorithm in C++
  (ctypes-loaded shared library) for large graphs; falls back to numpy
  when the library isn't built.

Partition lists are cached to ``<cache_dir>/<name>_<psize>.npy`` exactly
like the reference (sampler.py:44-51), with an atomic rename to fix its
multi-process startup race (SURVEY.md §2.4 last bullet).
"""

import os
import tempfile

import numpy as np

from gist_tpu.partition.greedy import greedy_partition


def get_partition_list(senders, receivers, n_nodes, psize,
                       cache_dir=None, name=None, seed=0, method="refined"):
    """Split nodes into ``psize`` clusters; returns list of int64 arrays.

    ``method="refined"`` (default) is the multilevel C++ partitioner
    (HEM coarsening + k-way boundary refinement, partition.cpp);
    ``"bfs"`` is single-level BFS graph growing.  Mirrors
    partition_utils.get_partition_list + sampler.py's .npy cache.
    """
    if cache_dir and name:
        path = os.path.join(cache_dir, f"{name}_{psize}_{method}.npy")
        if os.path.exists(path):
            return list(np.load(path, allow_pickle=True))
    parts = _partition(senders, receivers, n_nodes, psize, seed, method)
    if cache_dir and name:
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".npy")
        os.close(fd)
        np.save(tmp, np.asarray(parts, dtype=object), allow_pickle=True)
        os.replace(tmp, path)  # atomic: concurrent ranks never see partials
    return parts


def _partition(senders, receivers, n_nodes, psize, seed, method="refined"):
    try:
        from gist_tpu.partition.native import (native_partition,
                                               native_refined_partition)
        if method == "refined":
            return native_refined_partition(senders, receivers, n_nodes,
                                            psize, seed)
        return native_partition(senders, receivers, n_nodes, psize, seed)
    except (ImportError, OSError):
        parts = greedy_partition(senders, receivers, n_nodes, psize, seed)
        if method == "refined":
            from gist_tpu.partition.greedy import refine_partition
            parts = refine_partition(senders, receivers, n_nodes, parts)
        return parts
