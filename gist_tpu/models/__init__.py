"""Functional GNN models over plain param pytrees.

Every model is a (init, apply) pair of pure functions; parameters are
nested dicts of ``jnp`` arrays with weights in ``(in, out)`` layout
("x @ w"), the natural MXU orientation.  The torch reference stores
Linear weights transposed ``(out, in)``; the IST slicing rules in
gist_tpu/ist/slicing.py document the mapping.

Model families (reference parity):
* :mod:`gist_tpu.models.gcn`  — GraphConv stack (gcn/gcn.py:6-67)
* :mod:`gist_tpu.models.sage` — ISTSAGELayer stack a.k.a. the cluster-GCN
  "GCN" model (cluster_gcn/modules.py:191-314), plus GraphSAGE
  (modules.py:100-189)
* :mod:`gist_tpu.models.gat`  — multi-head GAT (gcn/gat.py:24-98), with
  the head-mean bug fixed (mean over heads, not all dims — SURVEY §2.4)
"""

from gist_tpu.models import gcn, sage, gat
from gist_tpu.models.layers import graph_conv, sage_layer, gat_layer
