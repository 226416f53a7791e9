"""Test harness: run everything on a virtual 8-device CPU mesh.

The JAX analog of the reference's N-processes-one-GPU fake cluster
(SURVEY.md §4): ``xla_force_host_platform_device_count`` gives shard_map
tests real multi-device semantics without TPU hardware.  Must run before
jax is imported anywhere, hence the env mutation at conftest import time.
"""

import os

# Force CPU: the session's TPU plugin ignores the JAX_PLATFORMS env var,
# so the config must be updated post-import (verified: env alone still
# yields the TPU device, where fp32 matmuls run at bf16 precision and
# fail the numerical-parity tolerances below).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() >= 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_random_graph(rng, n_nodes=50, n_edges=300, self_loops=True):
    """Small random directed graph (numpy edge list) for kernel tests."""
    senders = rng.integers(0, n_nodes, size=n_edges)
    receivers = rng.integers(0, n_nodes, size=n_edges)
    if self_loops:
        import gist_tpu.graph as G
        senders, receivers = G.add_self_loops(senders, receivers, n_nodes)
    return senders, receivers


def dense_adj(senders, receivers, n_nodes):
    """Dense adjacency A with A[r, s] = multiplicity of edge s->r, the
    numpy oracle for aggregation tests (A @ X == sum over in-edges)."""
    A = np.zeros((n_nodes, n_nodes), dtype=np.float64)
    np.add.at(A, (np.asarray(receivers), np.asarray(senders)), 1.0)
    return A
