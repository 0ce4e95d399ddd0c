"""Tracing / profiling utilities (SURVEY.md section 5.1).

The reference only records wall-clock per iteration (solver.py:431,
530-531).  Here:
  * :class:`StepTimer` — per-iteration timing with steps/sec and
    path-steps/sec/chip summaries (the BASELINE.json metric),
  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of the jitted steps,
  * :func:`debug_nans` — context manager toggling ``jax_debug_nans``
    (the framework's NaN-hunting switch; there is no race detection to
    rebuild — the reference is single-threaded and JAX programs are
    deterministic by construction).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    def __init__(self, K: int = 1, N: int = 1):
        self.K, self.N = K, N
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_s(self) -> float:
        # skip the first (compile) iteration when possible
        ts = self.times[1:] if len(self.times) > 1 else self.times
        return sum(ts) / max(len(ts), 1)

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.mean_s if self.mean_s else 0.0

    @property
    def path_steps_per_sec_per_chip(self) -> float:
        return self.K * self.N * self.steps_per_sec / jax.device_count()

    def summary(self) -> dict:
        return {
            "iterations": len(self.times),
            "mean_s_per_iter": self.mean_s,
            "steps_per_sec": self.steps_per_sec,
            "path_steps_per_sec_per_chip": self.path_steps_per_sec_per_chip,
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pspde-trace"):
    """jax.profiler trace around a block; view with TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    with jax.debug_nans(enable):
        yield
