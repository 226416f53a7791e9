"""Experiment orchestration — the L7 layer (reference: script/**).

The reference sweeps spawn one OS process per rank with `os.system`,
scrape the last 5 stdout lines by position, and garbage-collect
stragglers with squeue/scancel (SURVEY.md §3.5).  Here a sweep is a
plain in-process grid over library calls returning result dicts, with
JSON-lines persistence and resume-by-key (the one good idea in
run_gat_distrib_sweep.py:18-22, kept).
"""

from gist_tpu.sweeps.runner import SweepRunner, grid
