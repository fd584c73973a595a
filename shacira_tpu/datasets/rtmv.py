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

    def load_view(base):
        img = _read_exr(os.path.join(root, base + '.exr'))
        with open(os.path.join(root, base + '.json')) as f:
            meta = json.load(f)
        cam = meta['camera_data']
        pose = np.asarray(cam['cam2world'], np.float32).T
        if mip:
            step = 2 ** mip
            img = img[::step, ::step]
        rgba = img[..., :4] if img.shape[-1] >= 4 else img[..., :3]
        depth = img[..., -1] if img.shape[-1] >= 5 else None
        return rgba, depth, pose, cam['intrinsics']

    imgs, depths, poses, intr = [], [], [], None
    for base in sel:
        rgba, depth, pose, intr = load_view(base)
        imgs.append(rgba)
        depths.append(depth)
        poses.append(pose)

    imgs = np.stack(imgs)
    poses = np.stack(poses)
    h, w = imgs.shape[1:3]
    s = 1.0 / (2 ** mip)
    fx, fy = intr['fx'] * s, intr['fy'] * s
    x0 = intr['cx'] * s - w // 2
    y0 = intr['cy'] * s - h // 2

    # raygen once per selected view BEFORE normalization: the similarity
    # transform below changes only camera positions, never directions
    dirs_all = [pinhole_rays(pose, h, w, fx, fy, x0, y0)[1] for pose in poses]

    # Normalize the SCENE into [-1,1] with depth-pointcloud center/scale
    # (the reference's normalization, rtmv_dataset.py:89-108; depth = ray
    # distance), camera-sphere fallback when no depth channel exists.  The
    # frame is ALWAYS derived from the TRAIN files so every split shares
    # one coordinate system.
    def view_pointcloud(img_v, depth_v, pose_v, dirs_v):
        if depth_v is None:
            return None
        alpha_ok = (img_v[..., 3] > 0.5) if img_v.shape[-1] >= 4 \
            else np.ones(img_v.shape[:2], bool)
        hit = (alpha_ok & (depth_v > 0) & np.isfinite(depth_v)).reshape(-1)
        if not hit.any():
            return None
        if dirs_v is None:
            dirs_v = pinhole_rays(pose_v, h, w, fx, fy, x0, y0)[1]
        t = depth_v.reshape(-1)[hit]
        return pose_v[:3, 3][None, :] + dirs_v[hit] * t[:, None]

    cache = {b: i for i, b in enumerate(sel)}
    frame_files = files[:n_train] if n_train else files
    pc, frame_cams = [], []
    for base in frame_files:
        if base in cache:
            i = cache[base]
            img_v, depth_v, pose_v, dirs_v = (imgs[i], depths[i], poses[i],
                                              dirs_all[i])
        else:
            img_v, depth_v, pose_v, _ = load_view(base)
            dirs_v = None
        frame_cams.append(pose_v[:3, 3])
        p = view_pointcloud(img_v, depth_v, pose_v, dirs_v)
        if p is not None:
            pc.append(p)
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
        centers = np.stack(frame_cams)
        center = centers.mean(axis=0)
        scale = np.abs(centers - center).max() / 2.0
    poses[:, :3, 3] = (poses[:, :3, 3] - center) / scale

    # ray distance bounds covering the unit cube from every camera (the old
    # fixed far=6 silently missed the scene when normalized cameras sit
    # farther out)
    cam_r = np.linalg.norm(poses[:, :3, 3], axis=-1)
    margin = float(np.sqrt(3.0))
    dist_min = max(0.0, float(cam_r.min()) - margin)
    dist_max = float(cam_r.max()) + margin

    rays_o = np.stack([np.broadcast_to(pose[:3, 3], (h * w, 3))
                       for pose in poses]).astype(np.float32)
    rays_d = np.stack(dirs_all)

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
        rays_o=rays_o, rays_d=rays_d,
        masks=masks.reshape(len(sel), -1, 1), h=h, w=w,
        dist_min=dist_min, dist_max=dist_max, pointcloud=pointcloud,
        norm_center=np.asarray(center, np.float32),
        norm_scale=float(scale))
