"""Profiling + metrics — the TPU replacement for the reference's CPU/GPU
profilers (/root/reference/src/core/cpu_profiling.h, src/dx/dx_profiling.h;
SURVEY.md §5.1).

The reference records begin/end events into lock-free buffers and rebuilds a
block tree per frame. Under XLA, intra-step timing comes from the hardware
profiler, so this module provides:

  - `profile_block(name)`: `jax.named_scope` + optional `jax.profiler`
    TraceAnnotation so blocks show up in TensorBoard/perfetto traces — the
    CPU_PROFILE_BLOCK equivalent.
  - `trace(dir)`: context manager around jax.profiler.trace.
  - `StatsLogger`: host-side aggregation of per-step metric pytrees
    (StepInfo counters = the reference's CPU_PROFILE_STAT values like
    "Num broadphase overlaps", physics.cpp:1258-1262) with CSV dump —
    the VecMonitor analog (learning/vec_monitor.py).
  - `step_timer`: wall-clock timing helper that forces a host sync, since
    dispatch is async (and `block_until_ready` can be unreliable through
    remote-TPU tunnels).
"""

from __future__ import annotations

import contextlib
import csv
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_block(name: str):
    """Annotate a trace region (CPU_PROFILE_BLOCK equivalent)."""
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard (GPU-profiler analog)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force device->host materialization of one leaf (reliable sync)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))


@contextlib.contextmanager
def step_timer(out: Dict[str, float], key: str, result_tree=None):
    t0 = time.perf_counter()
    yield
    if result_tree is not None:
        sync(result_tree)
    out[key] = time.perf_counter() - t0


class StatsLogger:
    """Accumulates per-step metric dicts (scalars) and writes CSV — the
    profiler-stat + VecMonitor replacement."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.rows: List[Dict[str, float]] = []

    def log(self, step: int, metrics: Dict) -> None:
        row = {"step": step}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self.rows.append(row)

    def flush(self) -> None:
        if not self.path or not self.rows:
            return
        keys = sorted({k for r in self.rows for k in r})
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.rows)
