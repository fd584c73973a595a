"""Structured point cloud (octree) utilities.

TPU-native replacement for the kaolin SPC dependency
(``kaolin.ops.spc`` used throughout the reference: octree build, dual octree
+ "trinkets", queries — see ``wisp/models/grids/octree_grid.py:16,320`` and
``wisp/ops/spc/*``).  Design: per-level *sorted morton code* arrays instead
of the byte-packed octree; queries are vectorized binary searches
(``searchsorted``), which map well onto XLA, and all structure building is
host-side numpy (structures are static during training).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def spread_bits_np(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits (for 3D morton), up to 10 input bits."""
    x = x.astype(np.uint64) & np.uint64(0x3FF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
    return x


def morton3d_np(pts: np.ndarray) -> np.ndarray:
    """[N, 3] int cells -> morton codes (x-major like kaolin)."""
    return (spread_bits_np(pts[:, 0]) << np.uint64(2)) \
        | (spread_bits_np(pts[:, 1]) << np.uint64(1)) \
        | spread_bits_np(pts[:, 2])


def _spread_bits_jnp(x):
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton3d(cells):
    """jnp [..., 3] int cells -> uint32 morton (levels <= 10)."""
    return (_spread_bits_jnp(cells[..., 0]) << 2) \
        | (_spread_bits_jnp(cells[..., 1]) << 1) \
        | _spread_bits_jnp(cells[..., 2])


def quantize_points(coords: np.ndarray, level: int) -> np.ndarray:
    """[-1,1]^3 float -> integer cells at the level (kaolin quantize_points)."""
    res = 2 ** level
    return np.clip(np.floor((coords * 0.5 + 0.5) * res), 0, res - 1).astype(np.int64)


class Octree:
    """Sparse occupancy hierarchy: per level a sorted unique morton array."""

    def __init__(self, level_codes: List[np.ndarray], max_level: int):
        self.level_codes = level_codes           # [level] -> sorted uint64
        self.max_level = max_level

    @classmethod
    def from_quantized_points(cls, cells: np.ndarray, level: int) -> 'Octree':
        """Build the hierarchy from occupied leaf cells (kaolin
        unbatched_points_to_octree equivalent)."""
        codes = np.unique(morton3d_np(cells.astype(np.uint64)))
        levels = [None] * (level + 1)
        levels[level] = codes
        cur = codes
        for l in range(level - 1, -1, -1):
            cur = np.unique(cur >> np.uint64(3))
            levels[l] = cur
        return cls(levels, level)

    @classmethod
    def make_dense(cls, level: int) -> 'Octree':
        res = 2 ** level
        ii = np.stack(np.meshgrid(*[np.arange(res)] * 3, indexing='ij'), -1)
        return cls.from_quantized_points(ii.reshape(-1, 3), level)

    @classmethod
    def from_pointcloud(cls, pts: np.ndarray, level: int,
                        dilate: int = 0) -> 'Octree':
        cells = quantize_points(pts, level)
        if dilate:
            offs = np.stack(np.meshgrid(*[np.arange(-dilate, dilate + 1)] * 3,
                                        indexing='ij'), -1).reshape(-1, 3)
            cells = (cells[:, None, :] + offs[None]).reshape(-1, 3)
            res = 2 ** level
            cells = np.clip(cells, 0, res - 1)
        return cls.from_quantized_points(cells, level)

    def num_cells(self, level: int) -> int:
        return len(self.level_codes[level])

    def points(self, level: int) -> np.ndarray:
        """Occupied cell coordinates [M, 3] at a level (morton-sorted)."""
        return morton_decode_np(self.level_codes[level])

    def occupancy_mask(self, level: int) -> np.ndarray:
        """Dense [res, res, res] bool — bridge to the dense occupancy AS."""
        res = 2 ** level
        occ = np.zeros((res, res, res), bool)
        p = self.points(level)
        occ[p[:, 0], p[:, 1], p[:, 2]] = True
        return occ


def morton_decode_np(codes: np.ndarray) -> np.ndarray:
    out = np.zeros((len(codes), 3), np.int64)
    c = codes.astype(np.uint64)
    for axis, shift in ((0, 2), (1, 1), (2, 0)):
        x = (c >> np.uint64(shift)) & np.uint64(0x09249249)
        x = (x | (x >> np.uint64(2))) & np.uint64(0x030C30C3)
        x = (x | (x >> np.uint64(4))) & np.uint64(0x0300F00F)
        x = (x | (x >> np.uint64(8))) & np.uint64(0x030000FF)
        x = (x | (x >> np.uint64(16))) & np.uint64(0x3FF)
        out[:, axis] = x.astype(np.int64)
    return out


def query_cells(sorted_codes, cells):
    """jnp: cells [..., 3] -> index into sorted_codes or -1 (kaolin
    unbatched_query equivalent, octree_as.py:145)."""
    codes = morton3d(cells)
    idx = jnp.searchsorted(sorted_codes, codes)
    idx = jnp.clip(idx, 0, sorted_codes.shape[0] - 1)
    found = sorted_codes[idx] == codes
    return jnp.where(found, idx, -1)


def build_dual(octree: Octree, level: int) -> Tuple[np.ndarray, np.ndarray]:
    """Dual octree at a level: unique cell-corner lattice points + trinkets.

    Returns (corners [C, 3], trinkets [M, 8]): for each occupied cell its 8
    corner indices into the corner array (kaolin make_trilinear_spc /
    points_to_corners equivalent, octree_grid.py:256-258).
    Corner order matches the hash-grid kernels: j bits = (x,y,z) high->low.
    """
    cells = octree.points(level)
    offs = np.asarray([[(j >> 2) & 1, (j >> 1) & 1, j & 1] for j in range(8)])
    corner_pts = (cells[:, None, :] + offs[None]).reshape(-1, 3)
    key = (corner_pts[:, 0] * (2 ** level + 1) + corner_pts[:, 1]) \
        * (2 ** level + 1) + corner_pts[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    trinkets = inv.reshape(-1, 8).astype(np.int32)
    corners = np.zeros((len(uniq), 3), np.int64)
    corners[inv] = corner_pts
    return corners, trinkets


def trilinear_coeffs(coords, cells, level: int):
    """jnp: interpolation weights of the 8 corners for coords inside cells.

    Matches kaolin coords_to_trilinear_coeffs / the hash kernel weights
    (corner j bits = x,y,z high->low).
    """
    res = 2 ** level
    x = (coords * 0.5 + 0.5) * res
    frac = jnp.clip(x - cells.astype(jnp.float32), 0.0, 1.0)
    fx, fy, fz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
    gx, gy, gz = 1 - fx, 1 - fy, 1 - fz
    return jnp.concatenate([
        gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
        fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz], axis=-1)


def total_variation(features, trinkets):
    """Mean squared difference between features of x-adjacent cell corners
    (ref wisp/ops/spc/metrics.py:12 total_variation): for each cell, corners
    j and j^4 differ along x; penalize their feature difference."""
    import jax.numpy as jnp
    f = features[trinkets]                     # [M, 8, F]
    dx = f[:, 4:] - f[:, :4]
    dy = f[:, (2, 3, 6, 7), :] - f[:, (0, 1, 4, 5), :]
    dz = f[:, (1, 3, 5, 7), :] - f[:, (0, 2, 4, 6), :]
    return (jnp.mean(dx ** 2) + jnp.mean(dy ** 2) + jnp.mean(dz ** 2)) / 3.0
