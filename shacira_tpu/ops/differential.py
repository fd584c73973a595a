"""Differential operators for implicit fields.

Equivalent of ``wisp/ops/differential/gradients.py:14-77`` (reference):
autodiff, finite-difference, and tetrahedron-stencil gradients (used for SDF
normals).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def autodiff_gradient(f, coords):
    """Exact gradient of a scalar field via jax (ref autodiff path)."""
    g = jax.vmap(jax.grad(lambda x: f(x[None])[0, 0]))(coords)
    return g


def finitediff_gradient(f, coords, eps: float = 5e-4):
    """Central differences along the axes (ref finite-diff path)."""
    offs = jnp.eye(3) * eps
    return jnp.concatenate(
        [(f(coords + offs[i]) - f(coords - offs[i])) / (2 * eps)
         for i in range(3)], axis=-1)


def tetrahedron_gradient(f, coords, eps: float = 5e-4):
    """4-tap tetrahedron stencil (ref tetrahedron path — 4 field evals
    instead of 6)."""
    k = jnp.asarray([[1.0, -1.0, -1.0], [-1.0, -1.0, 1.0],
                     [-1.0, 1.0, -1.0], [1.0, 1.0, 1.0]])
    g = 0.0
    for i in range(4):
        g = g + k[i] * f(coords + k[i] * eps)
    return g / (4.0 * eps)
