"""TriplanarGrid — multi-LOD pyramid of orthogonal feature planes.

Equivalent of ``wisp/models/grids/triplanar_grid.py`` (reference): per LOD a
triplet of (2^l + 1)^2 feature maps sampled bilinearly at the (yz), (xz),
(xy) projections of a 3D point and concatenated (so the effective feature
dim is 3x).  The reference samples with ``F.grid_sample(align_corners=True,
padding_mode='reflection')``; we implement the same bilinear sample directly
(coords are in [-1,1]; the AABB BLAS clamps queries, so reflection padding
only matters at |x|>1 which does not occur for in-box samples).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TriplanarGridConfig:
    feature_dim: int                    # per-plane feature dim (ref stores 3x)
    base_lod: int = 4
    num_lods: int = 4
    multiscale_type: str = 'sum'
    feature_std: float = 0.0
    feature_bias: float = 0.0

    @property
    def active_lods(self) -> Tuple[int, ...]:
        return tuple(self.base_lod + i for i in range(self.num_lods))

    @property
    def output_dim(self) -> int:
        per_lod = self.feature_dim * 3
        return per_lod * self.num_lods if self.multiscale_type == 'cat' else per_lod


def triplanar_grid_init(rng, cfg: TriplanarGridConfig):
    """Per LOD: three [S+1, S+1, F] planes, N(bias, std) init (ref :193-195)."""
    planes = []
    keys = jax.random.split(rng, cfg.num_lods)
    for k, lod in zip(keys, cfg.active_lods):
        s = 2 ** lod + 1
        ks = jax.random.split(k, 3)
        planes.append({ax: jax.random.normal(kk, (s, s, cfg.feature_dim))
                       * cfg.feature_std + cfg.feature_bias
                       for ax, kk in zip(('yz', 'xz', 'xy'), ks)})
    return {'planes': planes}


def _bilinear_plane(plane, uv):
    """Sample [S, S, F] plane at uv in [-1,1]^2, align_corners=True."""
    s = plane.shape[0]
    # align_corners: -1 -> 0, +1 -> S-1
    x = jnp.clip((uv + 1.0) * 0.5 * (s - 1), 0.0, s - 1)
    lo = jnp.clip(jnp.floor(x), 0, s - 2).astype(jnp.int32)
    frac = x - lo
    i0, j0 = lo[..., 0], lo[..., 1]
    fx, fy = frac[..., 0:1], frac[..., 1:2]
    p00 = plane[i0, j0]
    p01 = plane[i0, j0 + 1]
    p10 = plane[i0 + 1, j0]
    p11 = plane[i0 + 1, j0 + 1]
    return ((1 - fx) * (1 - fy) * p00 + (1 - fx) * fy * p01
            + fx * (1 - fy) * p10 + fx * fy * p11)


def interpolate(params, cfg: TriplanarGridConfig, coords):
    """coords [..., 3] -> features [..., output_dim].

    Per LOD: sample plane x at (y,z), plane y at (x,z), plane z at (x,y)
    (reference TriplanarFeatureVolume.forward, :198-227), concat the three,
    then 'sum' or 'cat' across LODs (ref :111-115).
    """
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    feats = []
    for lod_planes in params['planes']:
        fx = _bilinear_plane(lod_planes['yz'], c[:, (1, 2)])
        fy = _bilinear_plane(lod_planes['xz'], c[:, (0, 2)])
        fz = _bilinear_plane(lod_planes['xy'], c[:, (0, 1)])
        feats.append(jnp.concatenate([fx, fy, fz], axis=-1))
    stacked = jnp.stack(feats, axis=1)          # [N, L, 3F]
    if cfg.multiscale_type == 'sum':
        out = stacked.sum(axis=1)
    else:
        out = stacked.reshape(stacked.shape[0], -1)
    return out.reshape(*lead, -1)


def grid_size_bits(params) -> int:
    import numpy as np
    total = 0
    for lod_planes in params['planes']:
        for v in lod_planes.values():
            total += int(np.prod(v.shape)) * 32
    return total
