"""Multi-host (pod) execution glue and scaling benchmark harness.

The reference is strictly single-process/single-GPU (SURVEY §2.11); this
module is the new framework's pod story:

* :func:`initialize` wraps ``jax.distributed.initialize`` (coordinator
  discovery via env or args).
* :func:`global_mesh` builds a data-parallel mesh over every process's
  devices — collectives ride ICI within a slice, DCN across slices.
* Each host feeds its own shard of the ray/pixel batch
  (:func:`host_local_batch_slice`); parameters are replicated, XLA inserts
  the gradient ``psum``.
* :func:`scaling_report` measures throughput at increasing mesh sizes on the
  local devices (weak scaling: constant per-device batch), producing the
  scaling-efficiency numbers for the benchmark harness.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from shacira_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host init; no-op when single-process (ref: no equivalent)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(num_devices: Optional[int] = None):
    """1-D data mesh over all (global) devices."""
    return make_mesh(num_devices, devices=jax.devices())


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of the global batch this host should load.

    With B global samples over P processes, host p loads [p*B/P, (p+1)*B/P)
    and forms the global array with
    ``jax.make_array_from_process_local_data``."""
    p = jax.process_index()
    n = jax.process_count()
    per = global_batch // n
    return slice(p * per, (p + 1) * per)


def scaling_report(step_builder: Callable, batch_per_device: int,
                   device_counts: Optional[List[int]] = None,
                   steps: int = 20) -> Dict[int, Dict[str, float]]:
    """Weak-scaling throughput at increasing mesh sizes.

    Args:
        step_builder: (mesh, batch_size) -> callable() running one training
            step (pre-compiled; the callable must block on real completion).
        batch_per_device: per-device batch (weak scaling).
    Returns:
        {n_devices: {'items_per_s': ..., 'efficiency': ...}}
    """
    avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= avail]
    out = {}
    base = None
    for n in device_counts:
        mesh = make_mesh(n)
        step = step_builder(mesh, batch_per_device * n)
        step()                                 # warmup/compile
        t0 = time.time()
        for _ in range(steps):
            step()
        dt = time.time() - t0
        ips = batch_per_device * n * steps / dt
        if base is None:
            base = ips / n
        out[n] = {'items_per_s': ips, 'efficiency': ips / (n * base)}
    return out
