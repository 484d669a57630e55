"""Observability + infra utils: logging, profiler scheduling, compile cache.

Covers the SURVEY.md §5 auxiliary subsystems that previously had no direct
tests: the rank0 logger / scalar writer / metric accumulator
(utils/logging.py — reference imagenet_gen/src/utils.py:8-26 and
train.py:160-201), the step-scheduled profiler (utils/profiler.py —
reference utils/profiler.py:6-29 schedule semantics), and the persistent
compilation cache switch (utils/compile_cache.py).
"""

import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.utils.compile_cache import enable_persistent_cache
from bitdance_tpu.utils.logging import (
    MetricAccumulator,
    ScalarWriter,
    create_logger,
)
from bitdance_tpu.utils.profiler import StepProfiler, annotate, trace


def test_create_logger_rank0_file_and_idempotent(tmp_path):
    logger = create_logger(str(tmp_path))
    logger.info("hello from rank0")
    for h in logger.handlers:
        h.flush()
    text = (tmp_path / "log.txt").read_text()
    assert "hello from rank0" in text
    # second call returns the same configured logger, no duplicate handlers
    n = len(logger.handlers)
    assert create_logger(str(tmp_path)) is logger
    assert len(logger.handlers) == n
    # cleanup so other tests/loggers don't inherit the file handler
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()


def test_scalar_writer_roundtrip(tmp_path, monkeypatch):
    # force the JSONL fallback so the test doesn't depend on tensorboard
    import torch.utils.tensorboard as _tb  # noqa: F401  (present in env)
    import builtins

    real_import = builtins.__import__

    def no_tb(name, *a, **k):
        if name.startswith("torch.utils.tensorboard"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_tb)
    w = ScalarWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("train/lr", 1e-4, 10)
    w.close()
    rows = [json.loads(line) for line in
            (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert rows[0] == pytest.approx(
        {"tag": "train/loss", "value": 1.5, "step": 10,
         "time": rows[0]["time"]})
    assert rows[1]["tag"] == "train/lr"


def test_metric_accumulator_window_means():
    acc = MetricAccumulator()
    acc.update(loss=2.0, grad_norm=1.0)
    acc.update(loss=4.0, grad_norm=jnp.asarray(3.0))
    means, sps = acc.flush()
    assert means == {"loss": 3.0, "grad_norm": 2.0}
    assert sps > 0
    # window resets
    means2, _ = acc.flush()
    assert means2 == {}


def test_step_profiler_schedule(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append(("stop", None)))
    prof = StepProfiler(str(tmp_path), wait=3, warmup=1, active=2)
    for _ in range(10):
        prof.step()
    # starts exactly at step `wait`, stops at wait+warmup+active — once
    assert [c[0] for c in calls] == ["start", "stop"]
    assert f"host_{jax.process_index()}" in calls[0][1]
    prof.close()  # no dangling trace -> no extra stop
    assert [c[0] for c in calls] == ["start", "stop"]

    # disabled profiler never traces
    calls.clear()
    off = StepProfiler(str(tmp_path), wait=0, warmup=0, active=1,
                       enabled=False)
    for _ in range(5):
        off.step()
    assert calls == []


def test_step_profiler_close_mid_trace(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append("stop"))
    prof = StepProfiler(str(tmp_path), wait=0, warmup=5, active=5)
    prof.step()                      # starts tracing at step 0
    assert calls == ["start"]
    prof.close()                     # interrupted run still closes trace
    assert calls == ["start", "stop"]


def test_trace_context_and_annotation(tmp_path):
    # real jax.profiler trace on CPU: produces a trace directory
    with trace(str(tmp_path)):
        with annotate("unit-test-region"):
            jnp.asarray(np.arange(8)).sum().block_until_ready()
    produced = []
    for root, _, files in os.walk(tmp_path):
        produced += files
    assert produced, "trace produced no files"


def test_persistent_cache_switch(tmp_path, monkeypatch):
    d = enable_persistent_cache(str(tmp_path / "cache"))
    assert d == str(tmp_path / "cache")
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # kill switch
    monkeypatch.setenv("BITDANCE_COMPILE_CACHE", "0")
    assert enable_persistent_cache(str(tmp_path / "other")) == ""
    assert not os.path.isdir(str(tmp_path / "other"))
