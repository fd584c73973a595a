"""Per-step PRNG implementation selection for the trainers.

SHACIRA draws two full-codebook random fields every training step: the
rate-loss dither ``U(-0.5, 0.5)`` added to the latents before the
BitEstimator (ref wisp/models/grids/latent_grid.py:126-131) and the SGA
logistic sample inside the quantizer (ref
wisp/models/latent_decoders.py:183-191).  At NeRF scale that is ~7.9M
entries per draw, and the default threefry generator's ~O(20) VPU ops per
word make the two draws a measurable slice of an 81 ms step.

``step_key`` converts a raw threefry key into a typed key of a cheaper
implementation (``rbg`` / ``unsafe_rbg`` lower to the TPU's hardware
``RngBitGenerator``) for exactly these bulk draws.  The trainers keep their
key *stream* (split chain, checkpointed ``trainer.rng``) on threefry so
resume formats and small draws (ray jitter, pruning) are unchanged; only
the per-step bulk-noise keys are re-wrapped.  The noise distributions are
identical — only the generator behind them changes — so training is
statistically equivalent (the R-D trajectory parity test keeps passing
either way).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

VALID_IMPLS = ('threefry', 'rbg', 'unsafe_rbg')


def step_key(k: jax.Array, impl: str) -> jax.Array:
    """Re-wrap a raw threefry key ``k`` (uint32[2]) as a typed ``impl`` key.

    'threefry' returns ``k`` unchanged.  'rbg'/'unsafe_rbg' build their
    uint32[4] key data by duplicating the threefry words — fine for these
    generators, whose statistical caveats concern split/fold-in chains, not
    seed construction; each step already gets a distinct threefry-derived
    key.
    """
    if impl == 'threefry':
        return k
    if impl not in VALID_IMPLS:
        raise ValueError(f'unknown rng impl {impl!r}; expected {VALID_IMPLS}')
    data = jnp.concatenate([k, k]).astype(jnp.uint32)
    return jax.random.wrap_key_data(data, impl=impl)
