"""RTMV dataset (EXR RGB-D multiview).

Equivalent of ``wisp/datasets/formats/rtmv_dataset.py`` (reference): loads
``NNNNN.exr`` + ``NNNNN.json`` camera files, splits train/val/test by ratio
(ref :192-223), normalizes the scene by the depth-pointcloud center/scale
(ref :89-108), and exposes the depth pointcloud for octree pre-pruning.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Optional

import numpy as np

from shacira_tpu.datasets.nerf_synthetic import MultiviewData, pinhole_rays

log = logging.getLogger('shacira_tpu')

# reference split ratios (rtmv_dataset.py:192-223)
TRAIN_RATIO, VAL_RATIO = 0.7, 0.15


def _read_exr(path: str) -> np.ndarray:
    """[H, W, C] float32. Tries the native codec (ops/exr.py; handles the
    uncompressed files this framework writes), then cv2 (needs
    OPENCV_IO_ENABLE_OPENEXR), then imageio — the fallbacks cover
    compressed real-world RTMV captures when an EXR-capable build exists."""
    try:
        from shacira_tpu.ops.exr import read_exr_rgba
        return read_exr_rgba(path)
    except Exception:
        pass    # compressed / exotic layout: fall through to cv2 / imageio
    os.environ.setdefault('OPENCV_IO_ENABLE_OPENEXR', '1')
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
        if img is not None:
            if img.ndim == 3 and img.shape[-1] >= 3:
                img[..., :3] = img[..., 2::-1]  # BGR -> RGB
            return np.asarray(img, np.float32)
    except Exception:
        pass
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path), np.float32)


def load_rtmv(root: str, split: str = 'train', mip: int = 0,
              bg_color: str = 'white', max_views: Optional[int] = None) -> MultiviewData:
    files = sorted(f[:-4] for f in os.listdir(root) if f.endswith('.exr'))
    n = len(files)
    if n == 0:
        raise FileNotFoundError(f'no .exr views under {root}')
    n_train = int(n * TRAIN_RATIO)
    n_val = int(n * VAL_RATIO)
    sel = {'train': files[:n_train],
           'val': files[n_train:n_train + n_val],
           'test': files[n_train + n_val:]}[split]
    if max_views:
        sel = sel[:max_views]

    imgs, depths, poses, intr = [], [], [], None
    for base in sel:
        img = _read_exr(os.path.join(root, base + '.exr'))
        with open(os.path.join(root, base + '.json')) as f:
            meta = json.load(f)
        cam = meta['camera_data']
        poses.append(np.asarray(cam['cam2world'], np.float32).T)
        intr = cam['intrinsics']
        if mip:
            step = 2 ** mip
            img = img[::step, ::step]
        rgba = img[..., :4] if img.shape[-1] >= 4 else img[..., :3]
        imgs.append(rgba)
        depths.append(img[..., -1] if img.shape[-1] >= 5 else None)

    imgs = np.stack(imgs)
    poses = np.stack(poses)
    h, w = imgs.shape[1:3]
    scale = 1.0 / (2 ** mip)
    fx, fy = intr['fx'] * scale, intr['fy'] * scale
    x0 = intr['cx'] * scale - w // 2
    y0 = intr['cy'] * scale - h // 2

    # normalize the SCENE into [-1,1]: depth-pointcloud center/scale when
    # depth channels exist (the reference's normalization,
    # rtmv_dataset.py:89-108; depth = Euclidean ray distance), else fall
    # back to the camera-position bounding sphere.  Applying the similarity
    # transform to camera origins (directions unchanged) scales the implied
    # scene identically, keeping multiview consistency.
    pc = []
    for img, depth, pose in zip(imgs, depths, poses):
        if depth is None:
            continue
        hit = (img[..., 3] > 0.5) if img.shape[-1] >= 4 else depth > 0
        if not hit.any():
            continue
        o, dirs = pinhole_rays(pose, h, w, fx, fy, x0, y0)
        t = depth.reshape(-1)[hit.reshape(-1)]
        pc.append(o[hit.reshape(-1)] + dirs[hit.reshape(-1)] * t[:, None])
    pointcloud = None
    if pc:
        points = np.concatenate(pc, axis=0)
        center = points.mean(axis=0)
        scale = np.abs(points - center).max() / 0.9   # content within ±0.9
        pointcloud = ((points - center) / scale).astype(np.float32)
        if pointcloud.shape[0] > 500000:
            keep = np.random.RandomState(0).choice(
                pointcloud.shape[0], 500000, replace=False)
            pointcloud = pointcloud[keep]
    else:
        centers = poses[:, :3, 3]
        center = centers.mean(axis=0)
        scale = np.abs(centers - center).max() / 2.0
    poses[:, :3, 3] = (poses[:, :3, 3] - center) / scale

    rays_o, rays_d = [], []
    for pose in poses:
        o, d = pinhole_rays(pose, h, w, fx, fy, x0, y0)
        rays_o.append(o)
        rays_d.append(d)

    rgbs = np.clip(imgs[..., :3], 0.0, 1.0)
    if imgs.shape[-1] >= 4:
        alpha = np.clip(imgs[..., 3:4], 0.0, 1.0)
        masks = alpha > 0.5
        if bg_color == 'white':
            rgbs = np.clip(rgbs * alpha + (1 - alpha), 0.0, 1.0)
    else:
        masks = np.ones_like(rgbs[..., :1], bool)

    return MultiviewData(
        rgb=rgbs.reshape(len(sel), -1, 3).astype(np.float32),
        rays_o=np.stack(rays_o), rays_d=np.stack(rays_d),
        masks=masks.reshape(len(sel), -1, 1), h=h, w=w,
        dist_min=0.0, dist_max=6.0, pointcloud=pointcloud)
