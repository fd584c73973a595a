"""Per-channel blend / normalize function kit.

Equivalent of ``wisp/core/channel_fn.py`` + ``wisp/core/channels.py``
(reference): every RenderBuffer channel carries a blend function (how two
buffers composite, e.g. alpha-over for rgb, slerp for normals, logical-or for
hit masks) and a normalize function (how to map raw values to [0, 1] for
display).  All array math is jax.numpy so the kit can run inside jitted
compositing.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

_EPS = 1e-8


# -- normalize functions (ref channel_fn.py:48-136) -------------------------

def identity(c):
    return c


def normalize(c, min_val=None, max_val=None):
    """Min-max normalize to [0, 1]; bounds default to the data range."""
    lo = jnp.min(c) if min_val is None else min_val
    hi = jnp.max(c) if max_val is None else max_val
    return (c - lo) / jnp.maximum(hi - lo, _EPS)


def normalize_linear_scale(c, min_val=None, max_val=None, linear_scale=1.0):
    return normalize(c * linear_scale, min_val=min_val, max_val=max_val)


def normalize_log_scale(c, min_val=None, max_val=None):
    return normalize(jnp.log(jnp.maximum(c, _EPS) + 1.0),
                     min_val=min_val, max_val=max_val)


def normalize_vector(c):
    """Unit-normalize direction vectors along the last axis."""
    return c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), _EPS)


# -- blend functions (ref channel_fn.py:144-328) ----------------------------
# Signature: blend(c1, c2, alpha1, alpha2) -> blended channel; c1 is "front".

def blend_linear(c1, c2, alpha1, alpha2):
    """c1 + c2·(1 − c1): the alpha channel's own compositing rule."""
    return c1 + c2 * (1.0 - c1)


def blend_alpha_composite_over(c1, c2, alpha1, alpha2):
    """Painter's-algorithm alpha-over (the rgb default)."""
    a_out = alpha1 + alpha2 * (1.0 - alpha1)
    num = c1 * alpha1 + c2 * alpha2 * (1.0 - alpha1)
    return jnp.where(a_out > 0, num / jnp.maximum(a_out, _EPS),
                     jnp.zeros_like(c1))


def blend_alpha_lerp(c1, c2, alpha1, alpha2):
    return c1 * alpha1 + c2 * (1.0 - alpha1)


def blend_alpha_slerp(c1, c2, alpha1, alpha2):
    """Spherical lerp over the unit hypersphere (directional channels,
    e.g. normals); alpha1 is the interpolation weight."""
    t = alpha1
    u1 = normalize_vector(c1)
    u2 = normalize_vector(c2)
    dot = jnp.clip(jnp.sum(u1 * u2, axis=-1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    sin_omega = jnp.sin(omega)
    safe = jnp.abs(sin_omega) > _EPS
    w1 = jnp.where(safe, jnp.sin(t * omega) / jnp.where(safe, sin_omega, 1.0), t)
    w2 = jnp.where(safe, jnp.sin((1.0 - t) * omega)
                   / jnp.where(safe, sin_omega, 1.0), 1.0 - t)
    return w1 * u1 + w2 * u2


def blend_normal(c1, c2, alpha1, alpha2):
    """Front-pixel wins (categorical channels)."""
    return c1


def blend_multiply(c1, c2, alpha1, alpha2):
    return c1 * c2


def blend_screen(c1, c2, alpha1, alpha2):
    return 1.0 - (1.0 - c1) * (1.0 - c2)


def blend_add(c1, c2, alpha1, alpha2):
    return c1 + c2


def blend_sub(c1, c2, alpha1, alpha2):
    return c1 - c2


def blend_logical_and(c1, c2, alpha1, alpha2):
    return (c1.astype(bool) & c2.astype(bool)).astype(c1.dtype)


def blend_logical_or(c1, c2, alpha1, alpha2):
    return (c1.astype(bool) | c2.astype(bool)).astype(c1.dtype)


# -- channel descriptors (ref channels.py:16-85) ----------------------------

@dataclass
class Channel:
    """How a RenderBuffer channel blends, normalizes, and is bounded."""
    blend_fn: Callable = blend_alpha_composite_over
    normalize_fn: Callable = normalize
    min_val: Optional[Any] = None
    max_val: Optional[Any] = None


def create_default_channel() -> Channel:
    return Channel()


def channels_starter_kit() -> Dict[str, Channel]:
    """The standard channel kit (ref channels_starter_kit)."""
    return dict(
        rgb=Channel(blend_alpha_composite_over, identity, 0.0, 1.0),
        alpha=Channel(blend_linear, normalize, 0.0, 1.0),
        depth=Channel(blend_normal,
                      functools.partial(normalize_linear_scale,
                                        linear_scale=1000.0), 0.0),
        normal=Channel(blend_alpha_slerp, normalize_vector),
        hit=Channel(blend_logical_or, identity),
        err=Channel(blend_add, normalize),
        gt=Channel(blend_alpha_composite_over, identity, 0.0, 1.0),
    )
