"""Utility coverage: prefetch, timers, loggers."""

import json
import time

from gist_tpu.utils import JsonlLogger, StepTimer, prefetch, profile_trace


def test_prefetch_order_and_completion():
    items = list(range(20))

    def slow_gen():
        for i in items:
            time.sleep(0.001)
            yield i

    assert list(prefetch(slow_gen(), depth=3)) == items


def test_step_timer_warmup():
    t = StepTimer(warmup=2)
    for _ in range(5):
        t.start()
        time.sleep(0.001)
        t.stop()
    assert len(t.durs) == 3
    assert t.mean > 0
    assert t.edges_per_sec(1000) > 0


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "log.jsonl")
    lg = JsonlLogger(path)
    lg.log(step=1, loss=0.5)
    lg.log(step=2, loss=0.25)
    recs = [json.loads(l) for l in open(path)]
    assert recs[1]["loss"] == 0.25
    # None path is a no-op
    JsonlLogger(None).log(x=1)


def test_profile_trace_noop():
    with profile_trace(None):
        pass
