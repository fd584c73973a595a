"""Matcap and shadow shaders for SDF renders.

Parity targets in the reference:
  * ``wisp/ops/shaders/matcap.py`` + ``wisp/ops/geometric.py:130-155``
    (spherical envmap UV + matcap texture fetch; the reference samples on
    CPU via scipy — here it's a JAX bilinear sample).
  * ``wisp/ops/shaders/shadow_rays.py:20-80`` (ground-plane compositing +
    shadow rays toward a point light, gaussian-smoothed shadow map).

Buffers are the plain dicts produced by ``tracers/sdf_tracer`` (hit, depth,
xyz, normal, rgb).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def spherical_envmap(ray_dir, normal):
    """Matcap UV coordinates from ray direction and surface normal.

    JAX port of ``wisp/ops/geometric.py:130-155``: reflect the screen-space
    ray about the normal, project the reflection to sphere UVs.
    Returns [..., 2] in [0, 1].
    """
    rds = ray_dir * jnp.asarray([1.0, 1.0, -1.0])
    dot = jnp.sum(normal * rds, axis=-1, keepdims=True)
    r = rds - 2.0 * dot * normal
    r = r - jnp.asarray([0.0, 0.0, 1.0])
    m = 2.0 * jnp.sqrt(jnp.sum(r ** 2, axis=-1, keepdims=True))
    vn = 1.0 - (r[..., :2] / jnp.maximum(m, 1e-12) + 0.5)
    vn = jnp.clip(vn, 0.0, 1.0)
    return jnp.nan_to_num(vn)


def sample_texture_bilinear(tex, uv):
    """Bilinearly sample ``tex [H, W, C]`` at ``uv [..., 2]`` in [0, 1].

    Replaces the reference's scipy RegularGridInterpolator texture fetch
    (matcap.py:52-76); note the reference transposes the image so u indexes
    the first axis — mirrored here.
    """
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * (h - 1)
    y = uv[..., 1] * (w - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, w - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    t00 = tex[x0, y0]
    t01 = tex[x0, y0 + 1]
    t10 = tex[x0 + 1, y0]
    t11 = tex[x0 + 1, y0 + 1]
    return ((t00 * (1 - fx) * (1 - fy)) + (t01 * (1 - fx) * fy)
            + (t10 * fx * (1 - fy)) + (t11 * fx * fy))


def matcap_shader(rb: dict, rays, matcap, mm=None) -> dict:
    """Apply matcap shading (ref matcap.py:20-49).

    Args:
        rb: buffer dict with 'normal' [N, 3].
        rays: Rays with dirs [N, 3].
        matcap: [H, W, 3] float texture in [0, 1] (transposed layout like
            the reference's ``np.array(Image).transpose(1, 0, 2)``).
        mm: optional [3, 3] rotation applied to the view direction.
    Returns: rb with 'rgb' replaced by the matcap fetch.
    """
    view = rays.dirs
    if mm is not None:
        view = view @ jnp.asarray(mm).T
    uv = spherical_envmap(view, rb['normal'])
    rgb = sample_texture_bilinear(jnp.asarray(matcap), uv)[..., :3]
    return {**rb, 'rgb': rgb}


def load_matcap(path: str):
    """Load a matcap texture file in the reference's transposed layout."""
    from shacira_tpu.datasets.image import load_rgb
    return load_rgb(path).transpose(1, 0, 2)


def _gaussian_blur_1d(img, sigma: float, axis: int):
    radius = max(1, int(3 * sigma))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = [(0, 0)] * img.ndim
    pad[axis] = (radius, radius)
    padded = jnp.pad(img, pad, mode='edge')
    return jnp.apply_along_axis(
        lambda v: jnp.convolve(v, k, mode='valid'), axis, padded)


def gaussian_blur(img, sigma: float = 2.0):
    """Separable gaussian blur of a [H, W] map (ref gaussian_filter use)."""
    return _gaussian_blur_1d(_gaussian_blur_1d(img, sigma, 0), sigma, 1)


def shadow_shader(rb: dict, rays, trace_hit_fn, point_light, min_y: float,
                  image_shape=None, rng=None) -> dict:
    """Ground-plane + point-light shadow shading (ref shadow_rays.py:20-80).

    Args:
        rb: buffer dict with 'hit' [N], 'depth' [N, 1], 'xyz' [N, 3],
            'normal' [N, 3], 'rgb' [N, 3].
        trace_hit_fn: (Rays) -> hit [N] bool — traces shadow rays against
            the scene (the reference calls pipeline.tracer(...).hit).
        point_light: [3] light position.
        min_y: y height of the ground plane.
        image_shape: optional (H, W) to gaussian-smooth the shadow map.
        rng: optional key for the reference's jittered shadow directions.
    """
    from shacira_tpu.core.rays import make_rays
    o, d = rays.origins, rays.dirs
    rate = -d[:, 1]
    delta = o[:, 1] - min_y
    plane_t = delta / jnp.where(jnp.abs(rate) < 1e-5, 1e-5, rate)
    plane_hit = (jnp.abs(rate) >= 1e-5) & (plane_t > 0) & (plane_t < 500)
    depth = rb['depth'][..., 0]
    plane_hit = plane_hit & (~rb['hit'] | (plane_t < depth))

    hit = rb['hit'] & ~plane_hit
    depth = jnp.where(plane_hit, plane_t, depth)
    xyz = jnp.where(plane_hit[:, None], o + d * plane_t[:, None], rb['xyz'])
    normal = jnp.where(plane_hit[:, None],
                       jnp.asarray([0.0, 1.0, 0.0]), rb['normal'])

    light = jnp.asarray(point_light, jnp.float32)
    shadow_o = xyz + 0.01 * normal
    jitter = (jax.random.normal(rng, shadow_o.shape) * 0.01
              if rng is not None else 0.0)
    shadow_d = light[None, :] - shadow_o + jitter
    shadow_d = shadow_d / jnp.linalg.norm(shadow_d, axis=-1, keepdims=True)
    light_facing = jnp.sum(shadow_d * normal, axis=-1) > 0.0

    shadow_rays = make_rays(shadow_o, shadow_d, 0.0,
                            float(np.asarray(rays.dist_max).reshape(-1)[0]))
    shadow = trace_hit_fn(shadow_rays) & light_facing & (hit | plane_hit)

    shadow_map = jnp.clip((1.0 - shadow.astype(jnp.float32)) + 0.7, 0.0, 1.0)
    if image_shape is not None:
        shadow_map = gaussian_blur(
            shadow_map.reshape(image_shape), 2.0).reshape(-1)
    rgb = rb['rgb'] * shadow_map[:, None]
    ground = jnp.full((3,), 0.8)
    rgb = jnp.where(plane_hit[:, None], ground * shadow_map[:, None], rgb)
    return {**rb, 'rgb': rgb, 'hit': hit | plane_hit, 'depth': depth[:, None],
            'xyz': xyz, 'normal': normal, 'shadow': shadow}
