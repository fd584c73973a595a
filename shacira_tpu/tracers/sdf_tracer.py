"""SDF sphere tracer.

TPU-native re-design of ``wisp/tracers/packed_sdf_tracer.py`` (reference):
the reference sphere-traces packed rays with kaolin octree intervals and the
``find_depth_bound`` CUDA kernel to skip empty space; here every ray carries
its own state through a fixed number of masked steps inside one jitted
program, and empty-space skipping uses the dense occupancy grid (advance to
the current cell's exit when the sample lies in an unoccupied cell).

Hit tests mirror the reference (packed_sdf_tracer.py:120-124):
``|sdf| < min_dis`` or ``|sdf + sdf_prev|/2 < 5*min_dis``; rays terminate
past ``dist_max``.  Normals are finite-difference SDF gradients at hits
(:163-166) and the default rgb visualizes normals (:166).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from shacira_tpu.core.rays import Rays
from shacira_tpu.accel import occupancy as occ


@dataclass(frozen=True)
class SDFTracerConfig:
    num_steps: int = 64
    step_size: float = 0.8
    min_dis: float = 1e-3


def trace(sdf_fn, occ_state, occ_cfg: occ.OccupancyGridConfig,
          cfg: SDFTracerConfig, rays: Rays):
    """Sphere-trace rays against an SDF.

    Args:
        sdf_fn: coords [...,3] -> sdf [...,1].
    Returns:
        dict with hit [R], depth [R,1], xyz [R,3], normal [R,3], rgb [R,3],
        alpha [R,1] — RenderBuffer equivalent (ref :144-170).
    """
    R = rays.origins.shape[0]
    o, d = rays.origins, rays.dirs
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    # enter at the unit-cube boundary (the reference enters at the first
    # octree interval, :99)
    t0 = (-1.0 - o) / safe_d
    t1 = (1.0 - o) / safe_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    dist_max = jnp.minimum(jnp.broadcast_to(rays.dist_max, (R,)), tmax)
    t = jnp.maximum(jnp.broadcast_to(rays.dist_min, (R,)), tmin) + 1e-5
    alive = (tmax > tmin)
    res = occ_cfg.res
    cell_w = 2.0 / res

    def cell_exit_t(x, t):
        """Distance to the current cell's exit along each ray."""
        idx = jnp.clip(jnp.floor((x * 0.5 + 0.5) * res), 0, res - 1)
        bounds = (idx + (d > 0)) * cell_w - 1.0
        te = jnp.min((bounds - o) / safe_d, axis=-1)
        return jnp.maximum(te, t + 1e-5)

    def body(i, state):
        t, alive, hit, dist_prev = state
        x = o + d * t[:, None]
        occupied = occ.query(occ_state, occ_cfg, x)
        sdf = sdf_fn(x)[..., 0] * cfg.step_size
        # empty-space skip: jump to cell exit instead of the sdf step
        step = jnp.where(occupied, sdf, jnp.maximum(sdf, cell_exit_t(x, t) - t))
        new_hit = alive & occupied & (
            (jnp.abs(sdf) < cfg.min_dis)
            | (jnp.abs(sdf + dist_prev) * 0.5 < cfg.min_dis * 5))
        hit = hit | new_hit
        t = jnp.where(alive & ~new_hit, t + step, t)
        alive = alive & ~hit & (t < dist_max)
        dist_prev = jnp.where(alive, sdf, dist_prev)
        return t, alive, hit, dist_prev

    t, alive, hit, _ = jax.lax.fori_loop(
        0, cfg.num_steps, body,
        (t, alive, jnp.zeros(R, bool), jnp.full((R,), 20.0)))

    x = o + d * t[:, None]
    return {'hit': hit, 'depth': jnp.where(hit[:, None], t[:, None], 0.0),
            'xyz': jnp.where(hit[:, None], x, 0.0)}


def shade_normals(sdf_grad_fn, result):
    """Normals + normal-colored rgb at hit points (ref :163-166)."""
    grad = sdf_grad_fn(result['xyz'])
    normal = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-5)
    normal = jnp.where(result['hit'][:, None], normal, 0.0)
    rgb = (normal + 1.0) / 2.0
    alpha = result['hit'][:, None].astype(jnp.float32)
    return {**result, 'normal': normal, 'rgb': rgb * alpha, 'alpha': alpha}
