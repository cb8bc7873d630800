"""Tracing / profiling hooks.

The reference has only ad-hoc wall-clock prints (SURVEY.md §5); here
profiling is first-class: a step timer that reports steps/sec and rays/sec
over a sliding window, and an optional ``jax.profiler`` trace capture
controlled by config (``system.profile_dir`` / ``system.profile_steps``).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, Optional


class StepTimer:
    """Sliding-window throughput counter. Call ``tick(n_rays)`` once per
    completed step (after blocking on the result)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: deque = deque(maxlen=window + 1)
        self.rays: deque = deque(maxlen=window)
        self.times.append(time.perf_counter())

    def tick(self, n_rays: int) -> None:
        self.times.append(time.perf_counter())
        self.rays.append(n_rays)

    def stats(self) -> Dict[str, float]:
        if len(self.times) < 2:
            return {"steps_per_sec": 0.0, "rays_per_sec": 0.0}
        dt = self.times[-1] - self.times[0]
        n = len(self.times) - 1
        return {
            "steps_per_sec": n / dt if dt > 0 else 0.0,
            "rays_per_sec": sum(self.rays) / dt if dt > 0 else 0.0,
        }


class TraceCapture:
    """Capture a jax.profiler trace for steps [start, start+n) of a run.

    Enable via config: ``system.profile_dir=/tmp/trace system.profile_from=100
    system.profile_steps=5``; view with TensorBoard or xprof.
    """

    def __init__(self, cfg):
        sysc = cfg.get("system", {})
        self.dir: Optional[str] = sysc.get("profile_dir")
        self.start = int(sysc.get("profile_from", 10))
        self.n = int(sysc.get("profile_steps", 5))
        self._active = False

    def step(self, global_step: int) -> None:
        if self.dir is None:
            return
        import jax

        if global_step == self.start and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif self._active and global_step >= self.start + self.n:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profile] trace written to {self.dir}")

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
