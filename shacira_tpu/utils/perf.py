"""Profiling utilities.

Equivalent of the reference's observability tools (SURVEY §5): ``PerfTimer``
checkpoints (``wisp/utils/perf.py:46-91``) and NVTX-style named ranges —
mapped to ``jax.named_scope`` for XLA/xprof traces plus a host-side timer
that forces real device synchronization (the remote-tunneled TPU backend's
``block_until_ready`` is unreliable, so we sync by fetching one element).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def device_sync(x=None):
    """Force real completion of pending device work by fetching one element."""
    if x is None:
        return
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0].ravel()[0:1])


class PerfTimer:
    """Named checkpoint timer (ref PerfTimer): check() returns time since the
    previous checkpoint, optionally syncing a device value first."""

    def __init__(self, activate: bool = True):
        self.activate = activate
        self.reset()

    def reset(self):
        self.start = time.time()
        self.prev = self.start
        self.records = []

    def check(self, name: str = '', sync_value=None) -> float:
        if not self.activate:
            return 0.0
        device_sync(sync_value)
        now = time.time()
        dt = now - self.prev
        self.prev = now
        self.records.append((name, dt))
        return dt

    def summary(self) -> str:
        total = sum(dt for _, dt in self.records)
        lines = [f'{n or "?"}: {dt * 1e3:.2f} ms ({dt / max(total, 1e-12):.0%})'
                 for n, dt in self.records]
        return ' | '.join(lines)


@contextlib.contextmanager
def named_range(name: str):
    """NVTX-range equivalent: annotates the XLA trace (jax.named_scope)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: Optional[str]):
    """jax.profiler trace context (xprof); no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
