"""gist_tpu — a TPU-native GNN training framework with GIST capabilities.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
reference implementation (wolfecameron/GIST): GCN / GraphSAGE / GAT
models, Cluster-GCN-style graph partition mini-batching, and GIST's
independent sub-GCN training over randomly partitioned hidden
dimensions — built TPU-first:

* graphs are padded CSR/COO ``jnp`` arrays with static shapes (jit-stable),
* neighborhood aggregation is an XLA segment-sum or a Pallas SpMM kernel,
* IST dispatch/merge are pure pytree transforms; the "distributed" engine
  is ``vmap`` (single chip simulation) or ``shard_map`` over a ``subnet``
  mesh axis (multi-chip) with a constant number of collectives per sync,
* no parameter server: the global model is replicated (or host-offloaded
  for the ultra-wide regime) and every device slices its own shard.

See SURVEY.md for the reference analysis this design responds to.
"""

from gist_tpu.graph import Graph, graph_from_edges, add_self_loops, subgraph
from gist_tpu import data
from gist_tpu import ist
from gist_tpu import models
from gist_tpu import ops
from gist_tpu import parallel
from gist_tpu import train

__version__ = "0.1.0"
