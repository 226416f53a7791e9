"""Datasets: container, loaders, synthetic generators.

The reference pulls cora/citeseer/pubmed/reddit from DGL's download
cache and Amazon2M from GraphSAGE-format files (cluster_gcn/utils.py:
83-124, AmazonDataset.py).  This framework has no network access at
build time, so every loader accepts an on-disk path when real data is
present and falls back to deterministic synthetic graphs with the same
shape statistics (``synth-*`` names) for tests and benchmarks.
"""

from gist_tpu.data.container import Dataset
from gist_tpu.data.synthetic import synthetic_dataset, SYNTH_SPECS
from gist_tpu.data.loaders import load_dataset
