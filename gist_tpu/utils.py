"""Shared utilities: profiling, logging, timing — the TPU-native
replacements for the reference's wall-clock-only instrumentation
(SURVEY.md §5 tracing bullet)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace scope; no-op when log_dir is None.  View with
    tensorboard or xprof."""
    if log_dir is None:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Eval-excluded wall-clock accounting with warm-up skip — the
    reference's timing convention (gcn/train.py:102 skips 3 warm-up
    epochs; cluster_gcn.py:91-108 excludes eval) as an object."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.durs = []
        self._count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self):
        dt = time.time() - self._t0
        if self._count >= self.warmup:
            self.durs.append(dt)
        self._count += 1
        return dt

    @property
    def mean(self) -> float:
        return sum(self.durs) / len(self.durs) if self.durs else 0.0

    @property
    def total(self) -> float:
        return sum(self.durs)

    def edges_per_sec(self, edges_per_step: float) -> float:
        return edges_per_step / self.mean if self.mean else 0.0


def prefetch(iterable, depth: int = 2):
    """Run an iterator in a background thread, keeping ``depth`` items
    ready — overlaps host-side batch construction (subgraph extraction,
    padding) with device compute.  The reference builds every cluster
    batch synchronously between steps (cluster_gcn.py:92-95)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
        finally:
            q.put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            break
        yield item


class JsonlLogger:
    """Append-a-JSON-object-per-line logger — the machine-readable
    replacement for the reference's file-append Logger (utils.py:12-29)
    and positional stdout protocol."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)),
                        exist_ok=True)

    def log(self, **kv):
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(kv, default=float) + "\n")


def hardware_tag() -> str:
    """Self-describing hardware stamp for result records, e.g.
    ``tpu-v5-lite-1`` or ``cpu-mesh-8`` — mixed-hardware result files
    misled readers in round 2 (VERDICT weak #3: a K=1 row timed on the
    real chip sat next to CPU-mesh K rows with nothing marking them)."""
    import jax

    d = jax.devices()[0]
    n = jax.device_count()
    if d.platform == "cpu":
        return f"cpu-mesh-{n}"
    kind = getattr(d, "device_kind", d.platform)
    return f"{kind.strip().lower().replace(' ', '-')}-{n}"
