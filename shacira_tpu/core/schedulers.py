"""Hyper-parameter decay schedules.

Port of ``wisp/utils/schedulers.py`` (reference :4-29) — used for the entropy
regularization weight (cosine), SGA temperature (exp with decay period) and
latent-decoder LR warmup.
"""
from __future__ import annotations

import math


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
