"""Radiance-field tracer: raymarch + masked volume integration.

TPU-native re-design of ``wisp/tracers/packed_rf_tracer.py`` (reference).
The reference packs a variable number of samples per ray and integrates with
kaolin's ``exponential_integration`` segmented scan; here every ray carries a
fixed sample axis with a boolean mask — masked samples contribute zero
optical thickness, which is mathematically identical to packing — so the
whole trace is one static-shape XLA program.

Integration math (matches spc_render.exponential_integration, exclusive):
    tau_i   = density_i * delta_i * mask_i
    T_i     = exp(-cumsum_exclusive(tau))
    w_i     = T_i * (1 - exp(-tau_i))
    rgb     = sum_i w_i * c_i ;  alpha = sum_i w_i ;  depth = sum_i w_i * t_i
Background compositing follows the reference exactly
(packed_rf_tracer.py:149-153): white -> (1 - alpha) + rgb, black -> alpha*rgb.

An optional fixed-budget sample compaction (``max_samples``) evaluates the
field only on (up to) K occupied samples — the TPU analog of the reference's
packing, with a static K instead of data-dependent shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from shacira_tpu.core.rays import Rays
from shacira_tpu.accel import occupancy as occ


@dataclass(frozen=True)
class RFTracerConfig:
    raymarch_type: str = 'ray'     # 'ray' | 'voxel'
    num_steps: int = 64
    bg_color: str = 'white'
    max_intersections: int = 64    # 'voxel' mode DDA budget
    max_samples: int = 0           # >0: compact to K occupied samples


def volume_integrate(color, density, deltas, depth, mask):
    """Masked exclusive volume integration.

    Args:
        color [R,S,3], density [R,S], deltas [R,S], depth [R,S], mask [R,S].
    Returns:
        rgb [R,3], alpha [R,1], depth_out [R,1]
    """
    tau = density * deltas * mask
    cum = jnp.cumsum(tau, axis=-1)
    transmittance = jnp.exp(-(cum - tau))          # exclusive
    w = transmittance * (1.0 - jnp.exp(-tau))
    rgb = jnp.sum(w[..., None] * color, axis=-2)
    alpha = jnp.sum(w, axis=-1, keepdims=True)
    depth_out = jnp.sum(w * depth, axis=-1, keepdims=True)
    return rgb, alpha, depth_out


def _compact_eval(field_fn, samples, dirs, mask, max_samples: int):
    """Evaluate field on up to K occupied samples, scatter back dense.

    samples [R,S,3], dirs [R,3].  Returns color [R,S,3], density [R,S].
    """
    R, S = mask.shape
    flat_mask = mask.reshape(-1)
    flat_samples = samples.reshape(-1, 3)
    flat_dirs = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    # When the budget overflows (e.g. before the first pruning pass fills the
    # occupancy grid), drop by stride so remaining samples stay uniformly
    # distributed across rays instead of starving the tail rays.
    total = jnp.sum(flat_mask)
    stride = jnp.maximum(1, -(-total // max_samples))         # ceil div
    pos = jnp.cumsum(flat_mask) - 1
    keep = flat_mask & (pos % stride == 0)
    # stable compaction: slot index via exclusive cumsum of the kept mask
    slots = jnp.cumsum(keep) - 1
    slots = jnp.where(keep, slots, max_samples)               # dropped -> OOB
    flat_mask = keep
    src_idx = jnp.zeros((max_samples,), jnp.int32)
    src_idx = src_idx.at[slots].set(jnp.arange(R * S, dtype=jnp.int32),
                                    mode='drop')
    k_samples = flat_samples[src_idx]
    k_dirs = flat_dirs[src_idx]
    k_color, k_density = field_fn(k_samples, k_dirs)
    k_valid = jnp.arange(max_samples) < jnp.sum(flat_mask)
    color = jnp.zeros((R * S, 3), k_color.dtype)
    density = jnp.zeros((R * S,), k_density.dtype)
    color = color.at[jnp.where(k_valid, src_idx, R * S)].set(k_color, mode='drop')
    density = density.at[jnp.where(k_valid, src_idx, R * S)].set(
        k_density[..., 0], mode='drop')
    return color.reshape(R, S, 3), density.reshape(R, S)


def trace(field_fn, occ_state, occ_cfg: occ.OccupancyGridConfig,
          cfg: RFTracerConfig, rays: Rays, rng):
    """Render rays against a radiance field.

    Args:
        field_fn: (coords [...,3], ray_d [...,3]) -> (rgb [...,3], density [...,1]).
        occ_state/occ_cfg: dense occupancy grid.
        rays: [R] rays.
        rng: key for raymarch jitter.
    Returns:
        dict with rgb [R,3], alpha [R,1], depth [R,1], hit [R] (RenderBuffer
        equivalent of the reference, packed_rf_tracer.py:170).
    """
    if cfg.raymarch_type == 'ray':
        m = occ.raymarch_ray(occ_state, occ_cfg, rays, cfg.num_steps, rng)
    elif cfg.raymarch_type == 'voxel':
        m = occ.raymarch_voxel(occ_state, occ_cfg, rays, cfg.num_steps, rng,
                               cfg.max_intersections)
    else:
        raise ValueError(cfg.raymarch_type)

    samples, mask = m['samples'], m['mask']
    R, S = mask.shape
    if cfg.max_samples and cfg.max_samples < R * S:
        color, density = _compact_eval(field_fn, samples, rays.dirs, mask,
                                       cfg.max_samples)
    else:
        dirs = jnp.broadcast_to(rays.dirs[:, None, :], samples.shape)
        color, density = field_fn(samples, dirs)
        density = density[..., 0]
        color = jnp.where(mask[..., None], color, 0.0)
        density = jnp.where(mask, density, 0.0)

    rgb, alpha, depth = volume_integrate(color, density, m['deltas'],
                                         m['depth'], mask)
    hit = alpha[..., 0] > 0.0
    if cfg.bg_color == 'white':
        rgb = (1.0 - alpha) + rgb
    else:
        rgb = alpha * rgb  # reference behavior (packed_rf_tracer.py:152)
    return {'rgb': rgb, 'alpha': alpha, 'depth': depth, 'hit': hit}
