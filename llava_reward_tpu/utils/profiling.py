"""Tracing / profiling hooks.

The reference has none beyond ad-hoc wall-clock timing of custom_forward
(eval/batch_inference_rm_phi.py:92-102, SURVEY.md §5). TPU-native
equivalents:
- ``trace(dir)``: jax.profiler trace context (view in TensorBoard/XProf);
- ``annotate(name)``: TraceAnnotation for named regions inside steps;
- ``StepTimer``: wall-clock per-step stats with warmup skip — the
  custom_forward-timing hook, done properly (host-fetch barrier, since
  block_until_ready is lazy on tunnelled backends);
- ``device_memory_stats``: live/peak HBM from the backend allocator.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-clock stats; skips the first ``warmup`` steps (compile).

    with timer.step():  # fetch results inside the block for a true barrier
        out = np.asarray(fn(...))
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def stats(self) -> Dict[str, float]:
        import numpy as np

        if not self.times:
            return {"steps": 0}
        a = np.asarray(self.times)
        return {
            "steps": len(a),
            "mean_s": float(a.mean()),
            "median_s": float(np.median(a)),
            "p95_s": float(np.percentile(a, 95)),
            "min_s": float(a.min()),
        }


def device_memory_stats() -> Optional[Dict[str, int]]:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
