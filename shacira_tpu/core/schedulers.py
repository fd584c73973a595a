"""Hyper-parameter decay schedules.

Port of ``wisp/utils/schedulers.py`` (reference :4-29) — used for the entropy
regularization weight (cosine), SGA temperature (exp with decay period) and
latent-decoder LR warmup.
"""
from __future__ import annotations

import math


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


class DecayScheduler:
    """fix / linear / exp / inv_sqrt / cosine schedules (host-side, per epoch)."""

    def __init__(self, total_steps, decay_name='fix', start=0.0, end=0.0, params=None):
        self.decay_name = decay_name
        self.start = start
        self.end = end
        self.total_steps = total_steps
        self.params = params

    def __call__(self, step):
        if self.decay_name == 'fix':
            return self.start
        elif self.decay_name == 'linear':
            if step > self.total_steps:
                return self.end
            return self.start + (self.end - self.start) * step / self.total_steps
        elif self.decay_name == 'exp':
            # max(end, start * exp(-ln(1/T) * step / total / decay_period))
            return max(
                self.end,
                self.start * math.exp(
                    -math.log(1.0 / self.params['temperature'])
                    * step / self.total_steps / self.params['decay_period']),
            )
        elif self.decay_name == 'inv_sqrt':
            return self.start * (self.total_steps / (self.total_steps + step)) ** 0.5
        elif self.decay_name == 'cosine':
            return self.end + 0.5 * (self.start - self.end) * (
                1 + math.cos(step / self.total_steps * math.pi))
        else:
            raise ValueError(f'Unknown decay name: {self.decay_name}')
