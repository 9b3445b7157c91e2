"""Tracing / profiling helpers.

The reference's observability is the KV logger's `profile_kv` wall-time
accumulators (`/root/reference/src/diffusion/logger.py:293-317`), kept in
core/logger.py.  The TPU-native layer adds `jax.profiler` integration
(SURVEY.md §5): step annotations show up in the TensorBoard trace viewer /
xprof when a trace is active, and are no-ops otherwise.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Optional

import jax


@contextmanager
def maybe_trace(log_dir: Optional[str], enabled: bool = False):
    """Capture a jax profiler trace into {log_dir}/plugins/profile when
    enabled (view with tensorboard or xprof)."""
    if not enabled or log_dir is None:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def step_annotation(name: str, step: int):
    """Annotate one training step for the trace viewer; free when no trace
    is active."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


@contextmanager
def named_scope(name: str):
    """TraceAnnotation context for sub-phases inside a step."""
    with jax.profiler.TraceAnnotation(name):
        yield
