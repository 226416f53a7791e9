"""Multi-chip graph parallelism: node/edge-sharded aggregation.

This capability does NOT exist in the reference — every rank there
holds the whole graph (ist_distrib.py:482-517; SURVEY.md §5
long-context bullet).  Here one graph's nodes, edges, and features are
partitioned across a ``graph`` mesh axis; neighborhood aggregation
exchanges only boundary ("halo") features via all_to_all over ICI.
"""

from gist_tpu.parallel.graph_shard import (ShardedGraph,
                                           build_sharded_graph,
                                           sharded_aggregate)
from gist_tpu.parallel.layers import (sharded_gat_attention,
                                      sharded_halo, sharded_mean_agg,
                                      sharded_sum_agg,
                                      sharded_whole_tensor_layer_norm)
