"""Thin CLI drivers mirroring the reference entry points (SURVEY.md L6).

Flag names follow the reference scripts so existing sweep configs map
1:1; results are also written as JSON (--result-json) instead of only
the positional-stdout protocol.

  python -m gist_tpu.cli.train_gcn       ~ gcn/train.py
  python -m gist_tpu.cli.train_ist       ~ gcn/train_ist.py
  python -m gist_tpu.cli.cluster_gcn     ~ cluster_gcn/cluster_gcn.py
  python -m gist_tpu.cli.ist_distrib     ~ cluster_gcn/cluster_gcn_ist_distrib.py
                                           (+ --ultra-wide ~ ..._ultra_wide.py)
  python -m gist_tpu.cli.gat_distrib     ~ cluster_gcn/cluster_gcn_ist_distrib_gat.py
"""
