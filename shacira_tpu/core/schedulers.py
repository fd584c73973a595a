"""Hyper-parameter decay schedules.

Semantics match ``wisp/utils/schedulers.py`` (reference :4-29) — used for the
entropy regularization weight (cosine), SGA temperature (exp with decay
period) and latent-decoder LR warmup — but the design is this repo's own:
trainers precompute whole schedules into `lax.scan` inputs, so the primitive
here is a *vectorized* pure function over an array of steps rather than a
per-step stateful object.
"""
from __future__ import annotations

import numpy as np


def grow_loss_lods(epoch: int, num_lods: int, grow_every: int,
                   growth_strategy: str):
    """LOD growth curricula (port of BaseTrainer.grow, base_trainer.py:348-364).

    Returns the list of LOD indices to apply the loss at for this epoch.
    """
    stage = min(num_lods, epoch // grow_every + 1)  # 1-indexed
    if growth_strategy == 'onebyone':
        return [stage - 1]
    if growth_strategy == 'increase':
        return list(range(stage))
    if growth_strategy == 'shrink':
        return list(range(num_lods))[stage - 1:]
    if growth_strategy == 'finetocoarse':
        return list(range(num_lods))[num_lods - stage:]
    if growth_strategy == 'onlylast':
        return [num_lods - 1]
    raise NotImplementedError(growth_strategy)


def schedule(name: str, steps, total_steps: int, start: float, end: float,
             *, decay_period: float = None, temperature: float = None):
    """Vectorized decay schedule: value at each entry of ``steps``.

    Semantics per name (matching the reference trainer's hyper-parameter
    decays, wisp/utils/schedulers.py:4-29, used at base_trainer.py:149-157):

    * ``fix``      — constant ``start``.
    * ``linear``   — ``start → end`` over ``total_steps``, then held at
      ``end``.
    * ``exp``      — ``start·T^(s / (total·decay_period))`` with floor
      ``end``, where ``T = temperature`` (so the value reaches T after
      ``decay_period`` of the run); the SGA temperature schedule.
    * ``inv_sqrt`` — ``start·sqrt(total / (total + s))``.
    * ``cosine``   — half-cosine from ``start`` (s=0) to ``end``
      (s=total_steps); the entropy-λ schedule.

    Args:
        steps: scalar or array of step indices.
    Returns:
        float64 ndarray shaped like ``steps`` (0-d for scalar input).
    """
    s = np.asarray(steps, np.float64)
    n = float(total_steps)
    if name == 'fix':
        return np.full_like(s, start)
    if name == 'linear':
        frac = np.minimum(s / n, 1.0)
        return start + (end - start) * frac
    if name == 'exp':
        return np.maximum(end,
                          start * np.asarray(temperature) ** (s / (n * decay_period)))
    if name == 'inv_sqrt':
        return start * np.sqrt(n / (n + s))
    if name == 'cosine':
        return end + 0.5 * (start - end) * (1.0 + np.cos(np.pi * s / n))
    raise ValueError(f'Unknown decay name: {name}')


class DecayScheduler:
    """Callable wrapper over :func:`schedule` (keeps trainer call sites
    terse: construct once, evaluate per epoch / per scan chunk)."""

    def __init__(self, total_steps, decay_name='fix', start=0.0, end=0.0,
                 params=None):
        p = params or {}
        self._args = (decay_name, total_steps, start, end)
        self._kw = {'decay_period': p.get('decay_period'),
                    'temperature': p.get('temperature')}

    def __call__(self, step):
        name, total, start, end = self._args
        return float(schedule(name, step, total, start, end, **self._kw))
