"""SDF metrics and sampling utilities.

Covers ``wisp/ops/sdf/metrics.py`` (IoU) and the SDF point-sampling patterns
of ``wisp/datasets/formats/mesh_sdf_dataset.py`` (surface / near-surface /
uniform sample modes) in host-side numpy plus jnp metrics.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_sdf_iou(pred, gts) -> float:
    """Sign-agreement IoU x100 (ref wisp/ops/sdf/metrics.py:11-28)."""
    inside_pred = np.asarray(pred) < 0
    inside_gts = np.asarray(gts) < 0
    union = np.sum(inside_pred | inside_gts)
    inter = np.sum(inside_pred & inside_gts)
    return 100.0 * float(inter) / max(float(union), 1.0)


def sample_uniform(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Uniform samples in [-1, 1]^3."""
    return rng.uniform(-1, 1, (n, 3)).astype(np.float32)


def sample_near_surface(rng: np.random.RandomState, surface_pts: np.ndarray,
                        n: int, variance: float = 0.01) -> np.ndarray:
    """Gaussian perturbations of surface points (ref 'near' mode)."""
    idx = rng.randint(0, len(surface_pts), n)
    return (surface_pts[idx]
            + rng.randn(n, 3).astype(np.float32) * np.sqrt(variance))


def sample_surface_sphere(rng: np.random.RandomState, n: int) -> np.ndarray:
    v = rng.randn(n, 3).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)
