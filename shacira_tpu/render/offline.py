"""Offline renderer: lookat cameras, batched tracing, turntable videos.

Equivalent of ``wisp/offline_renderer.py:92-320`` (reference): generates
pinhole rays from a lookat camera, traces a radiance field in ray batches,
and renders 360-degree turntables (the reference's ``render_final_view``
path, multiview_trainer.py:237-273).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.core.rays import make_rays


@dataclass(frozen=True)
class CameraConfig:
    width: int = 512
    height: int = 512
    fov: float = 30.0              # degrees, full vertical fov
    dist_min: float = 0.0
    dist_max: float = 6.0


def lookat_rays(origin, target, cfg: CameraConfig, up=(0.0, 1.0, 0.0)):
    """Pinhole rays for a camera at origin looking at target
    (ref _look_at, offline_renderer.py:23-89)."""
    origin = np.asarray(origin, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    fwd = target - origin
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    cup = np.cross(right, fwd)

    h, w = cfg.height, cfg.width
    f = 0.5 * h / np.tan(0.5 * np.deg2rad(cfg.fov))
    jj, ii = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing='ij')
    u = (ii + 0.5 - w / 2) / f
    v = -(jj + 0.5 - h / 2) / f
    dirs = (u[..., None] * right + v[..., None] * cup + fwd)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.broadcast_to(origin, dirs.shape)
    return (o.reshape(-1, 3).astype(np.float32),
            dirs.reshape(-1, 3).astype(np.float32))


def render_rays(trace_fn: Callable, rays_o: np.ndarray, rays_d: np.ndarray,
                cfg: CameraConfig, batch: int = 16384, rng=None) -> dict:
    """Batched full-frame render; trace_fn(rays, key) -> dict of buffers
    (the ray-batch splitting of offline_renderer.py:179-185)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = rays_o.shape[0]
    outs = None
    # pad to batch multiple for a single compiled trace shape
    pad = (-n) % batch
    if pad:
        rays_o = np.concatenate([rays_o, rays_o[:pad]])
        rays_d = np.concatenate([rays_d, rays_d[:pad]])
    for s in range(0, len(rays_o), batch):
        rng, k = jax.random.split(rng)
        rays = make_rays(rays_o[s:s + batch], rays_d[s:s + batch],
                         cfg.dist_min, cfg.dist_max)
        rb = trace_fn(rays, k)
        rb = {key: np.asarray(v) for key, v in rb.items()}
        if outs is None:
            outs = {key: [v] for key, v in rb.items()}
        else:
            for key, v in rb.items():
                outs[key].append(v)
    return {key: np.concatenate(v)[:n] for key, v in outs.items()}


def turntable(trace_fn: Callable, cfg: CameraConfig, num_angles: int = 16,
              radius: float = 3.0, elevation: float = 0.65,
              target=(0.0, 0.0, 0.0), rng=None, layers=None):
    """360-degree turntable frames (ref render_final_view,
    multiview_trainer.py:237-273).  Yields [H, W, 3] frames.

    ``layers`` ({name: PrimitivesPack}) are composited over each frame with
    the frame's depth buffer (the reference's active-data-layer painting,
    wisp_app.py:451)."""
    for a in range(num_angles):
        theta = 2 * np.pi * a / num_angles
        origin = np.asarray([radius * np.cos(theta), elevation,
                             radius * np.sin(theta)], np.float32)
        ro, rd = lookat_rays(origin, target, cfg)
        out = render_rays(trace_fn, ro, rd, cfg, rng=rng)
        frame = out['rgb'].reshape(cfg.height, cfg.width, 3)
        if layers:
            from shacira_tpu.render.overlay import PinholeCamera, draw_layers
            cam = PinholeCamera.from_lookat(origin, target, cfg)
            depth = out.get('depth')
            if depth is not None:
                depth = depth.reshape(cfg.height, cfg.width)
            frame = draw_layers(frame, cam, layers, depth=depth)
        yield frame


def save_gif(frames, path: str, fps: int = 10):
    from PIL import Image
    imgs = [Image.fromarray(np.clip(f * 255, 0, 255).astype(np.uint8))
            for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
