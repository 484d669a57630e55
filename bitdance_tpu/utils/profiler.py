"""Profiling + debug tooling.

Equivalent of utils/profiler.py:6-29 (a torch.profiler callback exporting
per-rank Chrome traces): here a step-scheduled jax.profiler trace emitting
per-host XProf/TensorBoard traces, plus jax debug toggles (the reference's
closest analogues are deterministic-cudnn flags and dynamo cache bumps —
SURVEY.md §5 race detection).
"""

from __future__ import annotations

import contextlib
import os

import jax


class StepProfiler:
    """Schedule-driven profiler: wait N steps, then capture M steps.

    Mirrors the reference's schedule (wait=40, warmup=2, active=2,
    profiler.py:16-23). Call .step() once per training step.
    """

    def __init__(self, log_dir: str, wait: int = 40, warmup: int = 2,
                 active: int = 2, enabled: bool = True):
        self.log_dir = os.path.join(log_dir, f"host_{jax.process_index()}")
        self.wait = wait
        self.warmup = warmup
        self.active = active
        self.enabled = enabled
        self._step = 0
        self._tracing = False

    def step(self) -> None:
        if not self.enabled:
            return
        start = self.wait
        stop = self.wait + self.warmup + self.active
        if self._step == start and not self._tracing:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        if self._step == stop and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
        self._step += 1

    def close(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


@contextlib.contextmanager
def trace(log_dir: str):
    """One-shot trace context (block_until_ready is the caller's job)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    """jax_debug_nans: fail fast on NaNs (the TPU-world sanitizer)."""
    jax.config.update("jax_debug_nans", enable)


def annotate(name: str):
    """Named region for traces (torch.profiler.record_function analogue)."""
    return jax.profiler.TraceAnnotation(name)
