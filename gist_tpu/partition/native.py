"""ctypes binding for the C++ partitioner (libgistpart.so).

Auto-builds with make on first use if the shared library is missing and
a toolchain is available; callers fall back to the numpy implementation
on any failure (see gist_tpu/partition/__init__.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libgistpart.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.greedy_partition.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, i64p]
    lib.greedy_partition.restype = None
    lib.induced_subgraph.argtypes = [
        i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, i64p]
    lib.induced_subgraph.restype = ctypes.c_int64
    lib.refined_partition.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, i64p]
    lib.refined_partition.restype = None
    lib.edge_cut.argtypes = [i64p, i64p, ctypes.c_int64, i64p]
    lib.edge_cut.restype = ctypes.c_int64
    _lib = lib
    return lib


def _assignment_to_parts(assignment: np.ndarray, psize: int):
    order = np.argsort(assignment, kind="stable")
    sorted_assign = assignment[order]
    starts = np.searchsorted(sorted_assign, np.arange(psize))
    ends = np.searchsorted(sorted_assign, np.arange(psize), side="right")
    return [order[a:b].copy() for a, b in zip(starts, ends)]


def native_refined_partition(senders, receivers, n_nodes, psize, seed=0):
    """Multilevel k-way partition (HEM coarsening + boundary refinement)
    — the METIS-grade path; see partition.cpp:refined_partition."""
    from gist_tpu.partition.greedy import build_csr
    lib = _load()
    indptr, nbrs = build_csr(senders, receivers, n_nodes)
    assignment = np.empty(n_nodes, dtype=np.int64)
    lib.refined_partition(np.ascontiguousarray(indptr),
                          np.ascontiguousarray(nbrs),
                          n_nodes, psize, seed, assignment)
    return _assignment_to_parts(assignment, psize)


def native_edge_cut(senders, receivers, n_nodes, assignment) -> int:
    from gist_tpu.partition.greedy import build_csr
    lib = _load()
    indptr, nbrs = build_csr(senders, receivers, n_nodes)
    assignment = np.ascontiguousarray(assignment, dtype=np.int64)
    return int(lib.edge_cut(np.ascontiguousarray(indptr),
                            np.ascontiguousarray(nbrs), n_nodes, assignment))


def native_partition(senders, receivers, n_nodes, psize, seed=0):
    from gist_tpu.partition.greedy import build_csr
    lib = _load()
    indptr, nbrs = build_csr(senders, receivers, n_nodes)
    assignment = np.empty(n_nodes, dtype=np.int64)
    lib.greedy_partition(np.ascontiguousarray(indptr),
                         np.ascontiguousarray(nbrs),
                         n_nodes, psize, seed, assignment)
    return _assignment_to_parts(assignment, psize)


def native_subgraph(senders, receivers, node_ids, n_nodes):
    """C++ induced-subgraph extraction (sampler hot path)."""
    lib = _load()
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    node_ids = np.ascontiguousarray(node_ids, dtype=np.int64)
    n_e = senders.shape[0]
    mapping = np.empty(n_nodes, dtype=np.int64)
    out_s = np.empty(n_e, dtype=np.int64)
    out_r = np.empty(n_e, dtype=np.int64)
    m = lib.induced_subgraph(senders, receivers, n_e, node_ids,
                             len(node_ids), n_nodes, mapping, out_s, out_r)
    return out_s[:m], out_r[:m]
