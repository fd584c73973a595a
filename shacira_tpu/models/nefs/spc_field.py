"""SPCField — renders a raw colored voxel point cloud (no neural decoder).

Equivalent of ``wisp/models/nefs/spc_field.py:10-146`` (reference): each
occupied octree cell carries an RGB(A) value; queries return the cell color
with a large constant density so the RF tracer composites the first hit.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.ops import spc


@dataclass(frozen=True)
class SPCFieldConfig:
    level: int = 7
    density_scale: float = 1e3     # opaque voxels


class SPCField:
    """Static colored voxel field built from a point cloud."""

    def __init__(self, cfg: SPCFieldConfig, points: np.ndarray,
                 colors: np.ndarray):
        """points [N,3] in [-1,1]; colors [N,3] in [0,1] (per-point, averaged
        per cell)."""
        self.cfg = cfg
        cells = spc.quantize_points(points, cfg.level)
        codes = spc.morton3d_np(cells.astype(np.uint64))
        order = np.argsort(codes)
        codes_sorted = codes[order]
        uniq, start = np.unique(codes_sorted, return_index=True)
        # average colors per occupied cell
        colors_sorted = colors[order]
        sums = np.add.reduceat(colors_sorted, start, axis=0)
        counts = np.diff(np.concatenate([start, [len(codes_sorted)]]))
        self.codes = jnp.asarray(uniq)
        self.colors = jnp.asarray((sums / counts[:, None]).astype(np.float32))

    def rgba(self, coords, ray_d=None):
        """coords [..., 3] -> (rgb, density); empty cells are transparent
        (ref rgba, spc_field.py:119-136)."""
        res = 2 ** self.cfg.level
        cells = jnp.clip(jnp.floor((coords * 0.5 + 0.5) * res), 0, res - 1)
        idx = spc.query_cells(self.codes, cells.astype(jnp.int32))
        valid = idx >= 0
        rgb = jnp.where(valid[..., None],
                        jnp.take(self.colors, jnp.maximum(idx, 0), axis=0), 0.0)
        density = jnp.where(valid[..., None], self.cfg.density_scale, 0.0)
        return rgb, density

    def occupancy_mask(self) -> np.ndarray:
        res = 2 ** self.cfg.level
        occ = np.zeros((res, res, res), bool)
        pts = spc.morton_decode_np(np.asarray(self.codes))
        occ[pts[:, 0], pts[:, 1], pts[:, 2]] = True
        return occ
