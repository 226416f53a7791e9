"""Guard the driver-facing entry points: bench.py and __graft_entry__.

These run on CPU (bench in fast/segment mode) — regressions here would
otherwise only surface when the driver runs them on hardware."""

import io
import json
import os
import sys


def test_bench_fast_prints_one_json_line(monkeypatch):
    monkeypatch.setenv("GIST_BENCH_FAST", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        bench.main()
    finally:
        sys.stdout = stdout
    lines = [l for l in buf.getvalue().strip().splitlines() if l]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0


def test_graft_entry_callable():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__
    import jax
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 4  # synth-tiny classes
