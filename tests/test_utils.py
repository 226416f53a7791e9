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


def test_plotting_run_and_sweep(tmp_path):
    """Figure rendering from the JSON result / sweep JSONL artifacts —
    the reference's matplotlib curve dumps (cluster_gcn.py:138-142,
    train_ist.py:27-37), rebuilt over the machine-readable contract."""
    from gist_tpu.plotting import main as plot_main

    res = {"dataset": "synth-x", "val_accs": [0.1, 0.5, 0.6],
           "test_accs": [0.1, 0.4, 0.55], "losses": [2.0, 1.0, 0.5]}
    rj = tmp_path / "run.json"
    rj.write_text(json.dumps(res))
    out = tmp_path / "run.png"
    plot_main(["run", str(rj), "-o", str(out)])
    assert out.stat().st_size > 1000

    jl = tmp_path / "sweep.jsonl"
    with open(jl, "w") as f:
        for k in (1, 2, 4):
            for ips in (5, 10):
                f.write(json.dumps({
                    "key": f"{k}-{ips}", "status": "ok",
                    "config": {"num_subnet": k, "iter_per_site": ips},
                    "result": {"best_test": 0.5 + 0.01 * k}}) + "\n")
        f.write(json.dumps({"key": "bad", "status": "error",
                            "error": "boom"}) + "\n")
    out2 = tmp_path / "sweep.png"
    plot_main(["sweep", str(jl), "--x", "num_subnet",
               "--y", "best_test", "--group", "iter_per_site",
               "-o", str(out2)])
    assert out2.stat().st_size > 1000
