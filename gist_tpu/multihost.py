"""Multi-host initialization — replaces the reference's manual
--rank/--dist-url/--world-size plumbing (ist_distrib.py:540-584) with
jax.distributed auto-discovery.

On a TPU pod slice, call :func:`init_multihost` once at program start
(each host runs the same program); ``jax.devices()`` then spans the
whole slice and every mesh built from it shards across hosts with the
same shard_map code used single-host.  No process groups, no TCP
rendezvous flags.
"""

from __future__ import annotations

import os
from typing import Optional


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    With no arguments, relies on the TPU environment auto-detection
    (jax.distributed.initialize() no-args works on Cloud TPU).  Returns
    True if initialization happened, False when single-host (detected
    by absence of any cluster env and no explicit arguments).
    """
    import jax

    explicit = coordinator is not None
    cluster_env = any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS"))
    if not explicit and not cluster_env:
        return False
    from jax._src import xla_bridge
    if xla_bridge.backends_are_initialized():
        import warnings
        warnings.warn("init_multihost called after backend init; skipping")
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return True
