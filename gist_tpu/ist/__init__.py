"""IST (independent subnetwork training) engine — the core of GIST.

The reference implements IST three times (simulation in
gcn/train_ist.py, distributed wrappers in the three
cluster_gcn_ist_*.py scripts), each a few hundred lines of per-layer
state-dict surgery plus pairwise NCCL broadcasts.  Here it is one pure
pytree transformation:

* :func:`sample_boundaries` — random disjoint partition of every hidden
  boundary (a reshaped ``jax.random.permutation``).
* :func:`dispatch` — slice a full-width param pytree into a sub-model's
  params (a gather; vmap-able over subnets).
* :func:`merge` — scatter trained sub-params back into the full pytree,
  averaging leaves that were not split (the reference semantics at
  train_ist.py:244-286 / ist_distrib.py:100-195).

Single-chip "distributed" training is ``vmap`` over the subnet axis
(gist_tpu/ist/simulate.py); multi-chip is ``shard_map`` over a
``subnet`` mesh axis (gist_tpu/ist/distributed.py), where dispatch is a
local slice of the replicated global params and merge is one
all-gather + scatter — replacing the reference's O(layers x sites)
ephemeral-group broadcast storm (ist_distrib.py:21-28, 231-281).
"""

from gist_tpu.ist.partition import sample_boundaries, boundary_sizes
from gist_tpu.ist.slicing import dispatch, merge, dispatch_all
