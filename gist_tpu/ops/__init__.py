"""TPU compute ops: sparse aggregation (SpMM), SDDMM, segment softmax.

These replace the reference's native DGL kernels (SURVEY.md §2.3):
``update_all(copy_src, sum)`` → :func:`aggregate`, GAT's edge UDFs →
:func:`sddmm_concat` + :func:`segment_softmax`.
"""

from gist_tpu.ops.spmm import (aggregate, spmm_segment,
                               spmm_segment_chunked, spmm_pallas,
                               set_default_backend)
from gist_tpu.ops.segment import segment_softmax, sddmm_concat, segment_weighted_sum
