"""Procedural dataset generators for quality-parity runs (zero-egress env).

Produces:
  * kodak-like RGB images (multi-octave value noise + geometric structures +
    smooth gradients — broadband content comparable in spectral richness to
    a natural photo) for the kodak-config 60k-epoch run;
  * a Blender-synthetic-format NeRF scene directory (transforms_train.json /
    transforms_val.json + PNGs) of an analytic multi-object scene (the
    richest scene constructible in-env), consumed end-to-end by
    apps/train_nerf.py through the standard loader.

Usage:
  python tools/make_synthetic_data.py images OUTDIR [--n 2] [--h 512 --w 768]
  python tools/make_synthetic_data.py nerf OUTDIR [--views 64] [--res 256]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


# ---------------------------------------------------------------------------
# Images
# ---------------------------------------------------------------------------

def _value_noise(rng, h, w, cells):
    g = rng.rand(cells + 1, cells + 1)
    ys = np.linspace(0, cells, h, endpoint=False)
    xs = np.linspace(0, cells, w, endpoint=False)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    fy = fy * fy * (3 - 2 * fy)          # smoothstep
    fx = fx * fx * (3 - 2 * fx)
    a = g[np.ix_(y0, x0)]
    b = g[np.ix_(y0, x0 + 1)]
    c = g[np.ix_(y0 + 1, x0)]
    d = g[np.ix_(y0 + 1, x0 + 1)]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def synth_photo(h=512, w=768, seed=0):
    """Kodak-like broadband test image in [0, 1], float32 [H, W, 3]."""
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.float32)
    # multi-octave value noise per channel (1/f spectrum)
    for c in range(3):
        acc = np.zeros((h, w))
        amp = 1.0
        for octv in (4, 8, 16, 32, 64, 128):
            acc += amp * _value_noise(rng, h, w, octv)
            amp *= 0.55
        img[..., c] = acc / acc.max()
    # smooth illumination gradient
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing='ij')
    img *= (0.6 + 0.4 * np.cos(np.pi * (xx * 0.7 + yy * 0.3)))[..., None]
    # hard-edged geometric structures (discs + bars at random orientations)
    for _ in range(24):
        cy, cx = rng.rand(2) * [h, w]
        r = rng.rand() * 0.08 * min(h, w) + 4
        col = rng.rand(3) * 0.9 + 0.05
        mask = (yy * h - cy) ** 2 + (xx * w - cx) ** 2 < r * r
        img[mask] = 0.65 * img[mask] + 0.35 * col
    for _ in range(16):
        ang = rng.rand() * np.pi
        d = np.cos(ang) * (xx - rng.rand()) + np.sin(ang) * (yy - rng.rand())
        mask = np.abs(d) < rng.rand() * 0.01 + 0.002
        img[mask] = 1.0 - img[mask]
    # fine stochastic texture (sensor-noise-like high-frequency energy)
    img += (rng.rand(h, w, 1) - 0.5) * 0.04
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def write_images(outdir, n=2, h=512, w=768):
    from PIL import Image
    os.makedirs(outdir, exist_ok=True)
    for i in range(n):
        img = synth_photo(h, w, seed=i)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(outdir, f'synth{i:02d}.png'))
    print(f'wrote {n} images to {outdir}')


# ---------------------------------------------------------------------------
# NeRF scene: analytic SDF raytracer over a composite object
# ---------------------------------------------------------------------------

def _scene_sdf(p):
    """Composite scene SDF + albedo, vectorized over p [N, 3].

    A lego-like arrangement: a box base, a tower of bricks, a sphere, a
    torus and cylinders — varied curvature, thin features, color detail.
    """
    def box(p, c, b):
        q = np.abs(p - c) - b
        return (np.linalg.norm(np.maximum(q, 0), axis=-1)
                + np.minimum(q.max(-1), 0.0))

    def sphere(p, c, r):
        return np.linalg.norm(p - c, axis=-1) - r

    def torus(p, c, R, r):
        q = p - c
        qx = np.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - R
        return np.sqrt(qx ** 2 + q[..., 1] ** 2) - r

    def cyl(p, c, r, hh):
        q = p - c
        d = np.stack([np.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - r,
                      np.abs(q[..., 1]) - hh], -1)
        return (np.minimum(np.maximum(d[..., 0], d[..., 1]), 0.0)
                + np.linalg.norm(np.maximum(d, 0), axis=-1))

    parts = [
        (box(p, (0.0, -0.45, 0.0), (0.55, 0.08, 0.55)), (0.15, 0.45, 0.15)),
        (box(p, (-0.25, -0.22, -0.2), (0.18, 0.14, 0.18)), (0.8, 0.15, 0.1)),
        (box(p, (-0.25, 0.04, -0.2), (0.14, 0.12, 0.14)), (0.9, 0.7, 0.1)),
        (sphere(p, (0.3, -0.1, 0.25), 0.22), (0.2, 0.3, 0.85)),
        (torus(p, (0.25, 0.28, -0.25), 0.18, 0.06), (0.85, 0.5, 0.1)),
        (cyl(p, (-0.3, 0.32, 0.3), 0.08, 0.2), (0.6, 0.2, 0.7)),
        (cyl(p, (0.05, -0.2, 0.0), 0.05, 0.25), (0.2, 0.8, 0.8)),
        (sphere(p, (-0.05, 0.45, 0.05), 0.12), (0.95, 0.9, 0.85)),
    ]
    d = np.full(p.shape[:-1], 1e9, np.float32)
    col = np.zeros(p.shape[:-1] + (3,), np.float32)
    for dist, c in parts:
        m = dist < d
        d = np.where(m, dist, d)
        col[m] = c
    # checker detail on the base
    checker = ((np.floor(p[..., 0] * 8) + np.floor(p[..., 2] * 8)) % 2)
    base_m = (np.abs(p[..., 1] + 0.45) < 0.1) & (col[..., 1] > 0.4) & (col[..., 0] < 0.2)
    col[base_m] *= (0.6 + 0.4 * checker[base_m])[..., None]
    return d, col


def _render_view(c2w, h, w, fx):
    """Sphere-trace the analytic scene; Lambertian shading, white bg."""
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing='ij')
    dirs = np.stack([(i + 0.5 - w / 2) / fx, -(j + 0.5 - h / 2) / fx,
                     -np.ones_like(i)], -1)
    d = dirs @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape).copy()
    p = o.copy()
    t = np.zeros(d.shape[:-1], np.float32)
    hit = np.zeros(d.shape[:-1], bool)
    for _ in range(96):
        dist, _ = _scene_sdf(p)
        hit |= dist < 1e-3
        step = np.where(hit, 0.0, np.clip(dist, 1e-4, 0.3))
        t += step
        p = o + d * t[..., None]
        if t.max() > 8:
            break
    _, albedo = _scene_sdf(p)
    # finite-difference normals
    eps = 1e-3
    grads = []
    for ax in range(3):
        dp = np.zeros(3, np.float32)
        dp[ax] = eps
        grads.append(_scene_sdf(p + dp)[0] - _scene_sdf(p - dp)[0])
    n = np.stack(grads, -1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    light = np.asarray([0.5, 0.8, 0.3])
    light = light / np.linalg.norm(light)
    diff = np.clip((n * light).sum(-1), 0, 1)
    amb = 0.35
    rgb = albedo * (amb + (1 - amb) * diff[..., None])
    alpha = hit.astype(np.float32)
    rgba = np.concatenate([np.where(hit[..., None], rgb, 1.0),
                           alpha[..., None]], -1)
    return np.clip(rgba, 0, 1), np.where(hit, t, 0.0).astype(np.float32)


def write_nerf_scene(outdir, views=64, val_views=8, res=256, seed=0):
    from PIL import Image
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    camera_angle_x = 0.6911112070083618          # blender lego default fov
    fx = 0.5 * res / np.tan(0.5 * camera_angle_x)

    def make_split(name, n, phase):
        frames = []
        os.makedirs(os.path.join(outdir, name), exist_ok=True)
        for v in range(n):
            theta = 2 * np.pi * (v / n) + phase
            elev = 0.35 + 0.45 * rng.rand()
            r = 3.2
            pos = np.asarray([r * np.cos(theta) * np.cos(elev),
                              r * np.sin(elev),
                              r * np.sin(theta) * np.cos(elev)], np.float32)
            fwd = -pos / np.linalg.norm(pos)
            right = np.cross(fwd, [0, 1, 0])
            right /= np.linalg.norm(right)
            up = np.cross(right, fwd)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 0] = right
            c2w[:3, 1] = up
            c2w[:3, 2] = -fwd
            c2w[:3, 3] = pos
            rgba, _ = _render_view(c2w, res, res, fx)
            fname = f'{name}/r_{v}'
            Image.fromarray((rgba * 255).astype(np.uint8), 'RGBA').save(
                os.path.join(outdir, fname + '.png'))
            frames.append({'file_path': f'./{fname}',
                           'transform_matrix': c2w.tolist()})
        meta = {'camera_angle_x': camera_angle_x, 'aabb_scale': 3.2,
                'frames': frames}
        with open(os.path.join(outdir, f'transforms_{name}.json'), 'w') as f:
            json.dump(meta, f)

    make_split('train', views, 0.0)
    make_split('val', val_views, 0.013)
    print(f'wrote {views}+{val_views} views to {outdir}')


def write_rtmv_scene(outdir, views=64, res=256, seed=0):
    """RTMV-format scene: flat NNNNN.exr (R/G/B/A + ray-distance Z channel,
    native uncompressed codec) + NNNNN.json camera files, consumed by
    datasets/rtmv.py's ratio-based splits.  Same analytic scene and camera
    rig as the Blender writer."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from shacira_tpu.ops.exr import write_exr
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    camera_angle_x = 0.6911112070083618
    fx = 0.5 * res / np.tan(0.5 * camera_angle_x)
    for v in range(views):
        theta = 2 * np.pi * (v / views) * 7.13   # decorrelate from split order
        elev = 0.35 + 0.45 * rng.rand()
        r = 3.2
        pos = np.asarray([r * np.cos(theta) * np.cos(elev),
                          r * np.sin(elev),
                          r * np.sin(theta) * np.cos(elev)], np.float32)
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, pos
        rgba, depth = _render_view(c2w, res, res, fx)
        write_exr(os.path.join(outdir, f'{v:05d}.exr'),
                  {'R': rgba[..., 0], 'G': rgba[..., 1], 'B': rgba[..., 2],
                   'A': rgba[..., 3], 'Z': depth})
        meta = {'camera_data': {
            # loader transposes on read (real RTMV stores row-major)
            'cam2world': c2w.T.tolist(),
            'intrinsics': {'fx': fx, 'fy': fx, 'cx': res / 2.0,
                           'cy': res / 2.0}}}
        with open(os.path.join(outdir, f'{v:05d}.json'), 'w') as f:
            json.dump(meta, f)
    print(f'wrote {views} RTMV views to {outdir}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('kind', choices=['images', 'nerf', 'rtmv'])
    ap.add_argument('outdir')
    ap.add_argument('--n', type=int, default=2)
    ap.add_argument('--h', type=int, default=512)
    ap.add_argument('--w', type=int, default=768)
    ap.add_argument('--views', type=int, default=64)
    ap.add_argument('--val-views', type=int, default=8)
    ap.add_argument('--res', type=int, default=256)
    args = ap.parse_args()
    if args.kind == 'images':
        write_images(args.outdir, args.n, args.h, args.w)
    elif args.kind == 'rtmv':
        write_rtmv_scene(args.outdir, args.views, args.res)
    else:
        write_nerf_scene(args.outdir, args.views, args.val_views, args.res)


if __name__ == '__main__':
    main()
