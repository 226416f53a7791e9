"""Training drivers: full-graph, IST simulation, cluster-GCN, distributed IST.

Each driver mirrors one reference entry point (SURVEY.md §3) but emits a
machine-readable JSON result dict instead of the reference's positional
stdout protocol (SURVEY.md §1 note), while still printing the same
human-readable summary lines for eyeball parity.
"""

from gist_tpu.train.common import (TrainConfig, make_optimizer,
                                   reference_lr_schedule, write_results)
