"""Learned entropy model (Balle-style univariate CDF) for rate estimation.

Functional port of ``wisp/models/prob_models/bit_estimator.py`` (reference):
four ``Bitparm`` layers computing ``x * softplus(h) + b (+ tanh(x)*tanh(a))``
with a final sigmoid.  The model outputs CDF values; bits for a latent ``w``
are ``-log2(CDF(w + .5) - CDF(w - .5))``.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BitEstimatorConfig:
    channels: int
    num_layers: int = 4
    is_symmetric: bool = False
    is_unimodal: bool = False


def bit_estimator_init(rng, cfg: BitEstimatorConfig):
    """Four Bitparm layers; params drawn N(0, 0.01) like the reference (:17-23)."""
    params = {}
    keys = jax.random.split(rng, 12)
    ki = iter(keys)
    for i in range(1, 5):
        final = i == 4
        layer = {
            'h': jax.random.normal(next(ki), (1, cfg.channels)) * 0.01,
            'b': (jnp.zeros((1, cfg.channels)) if cfg.is_symmetric
                  else jax.random.normal(next(ki), (1, cfg.channels)) * 0.01),
        }
        if not final:
            layer['a'] = jax.random.normal(next(ki), (1, cfg.channels)) * 0.01
        params[f'f{i}'] = layer
    return params


def _bitparm_apply(layer, cfg: BitEstimatorConfig, x, final: bool, single_channel=None):
    h, b = layer['h'], layer['b']
    a = layer.get('a')
    if single_channel is not None:
        h = h[:, single_channel]
        b = b[:, single_channel]
        if a is not None:
            a = a[:, single_channel]
    if final:
        return jax.nn.sigmoid(x * jax.nn.softplus(h) + b)
    if cfg.is_unimodal:
        a = jnp.abs(a)
    x = x * jax.nn.softplus(h) + b
    return x + jnp.tanh(x) * jnp.tanh(a)


def bit_estimator_apply(params, cfg: BitEstimatorConfig, x, single_channel=None):
    """CDF(x); gating of intermediate layers by num_layers matches ref :58-65.

    Args:
        x: [..., channels] (or [...] when ``single_channel`` selects one).
    """
    if cfg.num_layers > 1:
        x = _bitparm_apply(params['f1'], cfg, x, final=False, single_channel=single_channel)
    if cfg.num_layers > 2:
        x = _bitparm_apply(params['f2'], cfg, x, final=False, single_channel=single_channel)
    if cfg.num_layers > 3:
        x = _bitparm_apply(params['f3'], cfg, x, final=False, single_channel=single_channel)
    return _bitparm_apply(params['f4'], cfg, x, final=True, single_channel=single_channel)


# ---------------------------------------------------------------------------
# BitEstimatorN: width-N per-channel CDF model.
# Port of wisp/models/prob_models/bit_estimatorN.py:4-67 — grouped 1x1 convs
# whose weights pass through sigmoid (mixing matrices) / tanh (gates):
#   f1: h = sigmoid(W1) * x + b1;          h += tanh(g1) * tanh(h)
#   f2,f3: h = sigmoid(M) @ h + b;         h += tanh(g) * tanh(h)
#   f4: sigmoid(sigmoid(w4) . h + b4)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BitEstimatorNConfig:
    channels: int
    width: int = 4


def bit_estimator_n_init(rng, cfg: BitEstimatorNConfig):
    c, w = cfg.channels, cfg.width
    keys = jax.random.split(rng, 10)

    def n(k, shape, s=0.01):
        return jax.random.normal(k, shape) * s

    return {
        'f1': {'w': n(keys[0], (c, w)), 'b': n(keys[1], (c, w)),
               'g': n(keys[2], (c, w))},
        'f2': {'m': n(keys[3], (c, w, w)), 'b': n(keys[4], (c, w)),
               'g': n(keys[5], (c, w))},
        'f3': {'m': n(keys[6], (c, w, w)), 'b': n(keys[7], (c, w)),
               'g': n(keys[8], (c, w))},
        'f4': {'w': n(keys[9], (c, w)), 'b': jnp.zeros((c,))},
    }


def bit_estimator_n_apply(params, cfg: BitEstimatorNConfig, x,
                          single_channel=None):
    """CDF(x) for x [..., channels] (or [...] with ``single_channel``)."""
    if single_channel is not None:
        sel = lambda p: jax.tree.map(lambda v: v[single_channel:single_channel + 1],
                                     p)
        params = {k: sel(v) for k, v in params.items()}
        x = x[..., None]
    f1 = params['f1']
    h = jax.nn.sigmoid(f1['w']) * x[..., None] + f1['b']      # [..., C, W]
    h = h + jnp.tanh(f1['g']) * jnp.tanh(h)
    for name in ('f2', 'f3'):
        f = params[name]
        h = jnp.einsum('...cw,cvw->...cv', h, jax.nn.sigmoid(f['m'])) + f['b']
        h = h + jnp.tanh(f['g']) * jnp.tanh(h)
    f4 = params['f4']
    out = jax.nn.sigmoid(
        jnp.sum(jax.nn.sigmoid(f4['w']) * h, axis=-1) + f4['b'])
    if single_channel is not None:
        out = out[..., 0]
    return out


def entropy_bits(params, cfg: BitEstimatorConfig, weight, clamp_max: float = 50.0):
    """Total estimated bits of (noisy or rounded) latents ``weight``.

    Mirrors LatentGrid.ent_loss (latent_grid.py:132-136):
    ``prob = CDF(w+.5) - CDF(w-.5)``;
    ``bits = sum(clamp(-log(prob + 1e-10)/log 2, 0, clamp_max))``.
    """
    prob = (bit_estimator_apply(params, cfg, weight + 0.5)
            - bit_estimator_apply(params, cfg, weight - 0.5))
    bits = jnp.clip(-jnp.log(prob + 1e-10) / jnp.log(2.0), 0.0, clamp_max)
    return jnp.sum(bits)
