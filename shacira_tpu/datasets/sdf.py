"""SDF training datasets.

Equivalent of ``wisp/datasets/formats/mesh_sdf_dataset.py`` /
``octree_sdf_dataset.py`` (reference): pools of (coords, sdf) samples drawn
as a mix of surface / near-surface / uniform points, resampled on demand.
Also supports analytic SDF functions (for tests and procedural scenes).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from shacira_tpu.ops import mesh as mesh_ops
from shacira_tpu.ops import sdf as sdf_ops


class SDFDataset:
    """Pool of SDF samples with batch iteration (ref MeshSampledSDFDataset).

    ``num_samples`` enables the reference's cached-pool scheme
    (octree_sdf_dataset.py:151-160): the full (coords, sdf) pool is kept and
    :meth:`resample` subsamples a working set of that size; batches draw from
    the working set only.
    """

    def __init__(self, coords: np.ndarray, sdf: np.ndarray, batch_size: int,
                 seed: int = 0, num_samples: Optional[int] = None):
        self.pool_coords = np.asarray(coords, np.float32)
        self.pool_sdf = np.asarray(sdf, np.float32).reshape(-1, 1)
        self.batch_size = batch_size
        self.num_samples = num_samples
        self.rng = np.random.RandomState(seed)
        self.resample()

    @property
    def pool_size(self) -> int:
        return len(self.pool_coords)

    def resample(self) -> None:
        """Draw a fresh working set from the cached pool (quick subsample)."""
        if self.num_samples is None or self.num_samples >= self.pool_size:
            self.coords, self.sdf = self.pool_coords, self.pool_sdf
            return
        idx = self.rng.permutation(self.pool_size)[:self.num_samples]
        self.coords, self.sdf = self.pool_coords[idx], self.pool_sdf[idx]

    def __len__(self):
        return max(1, len(self.coords) // self.batch_size)

    def batch(self, _i=None) -> Tuple[np.ndarray, np.ndarray]:
        idx = self.rng.randint(0, len(self.coords), self.batch_size)
        return self.coords[idx], self.sdf[idx]


def from_analytic(sdf_fn: Callable[[np.ndarray], np.ndarray],
                  num_samples: int = 100000, batch_size: int = 4096,
                  modes: Sequence[str] = ('rand', 'near', 'near'),
                  surface_pts: Optional[np.ndarray] = None,
                  seed: int = 0) -> SDFDataset:
    """Sample an analytic SDF with the reference's mode mix
    (mesh_sdf_dataset.py sample_mode ['rand','near','near','trace','trace'])."""
    rng = np.random.RandomState(seed)
    pts = []
    per = num_samples // len(modes)
    for mode in modes:
        if mode == 'rand':
            pts.append(sdf_ops.sample_uniform(rng, per))
        elif mode in ('near', 'trace'):
            base = (surface_pts if surface_pts is not None
                    else sdf_ops.sample_uniform(rng, per))
            pts.append(sdf_ops.sample_near_surface(rng, base, per))
        else:
            raise ValueError(mode)
    coords = np.clip(np.concatenate(pts), -1, 1)
    return SDFDataset(coords, sdf_fn(coords), batch_size, seed)


def from_mesh(path_or_arrays, num_samples: int = 100000, batch_size: int = 4096,
              modes: Sequence[str] = ('rand', 'near', 'near', 'trace', 'trace'),
              seed: int = 0) -> SDFDataset:
    """Mesh -> SDF sample pool (ref MeshSampledSDFDataset + mesh2sdf)."""
    if isinstance(path_or_arrays, str):
        verts, faces = mesh_ops.load_obj(path_or_arrays)
    else:
        verts, faces = path_or_arrays
    verts = mesh_ops.normalize_mesh(verts)
    rng = np.random.RandomState(seed)
    per = num_samples // len(modes)
    pts = []
    for mode in modes:
        if mode == 'rand':
            pts.append(sdf_ops.sample_uniform(rng, per))
        elif mode in ('near', 'trace'):
            surf = mesh_ops.sample_surface(rng, verts, faces, per)
            pts.append(np.clip(
                sdf_ops.sample_near_surface(rng, surf, per), -1, 1))
        else:
            raise ValueError(mode)
    coords = np.concatenate(pts)
    sdf = mesh_ops.points_to_sdf(coords, verts, faces)
    return SDFDataset(coords, sdf, batch_size, seed)


def from_octree_narrowband(path_or_arrays, level: int = 6,
                           samples_per_voxel: int = 32,
                           num_samples: Optional[int] = 100000,
                           batch_size: int = 4096,
                           modes: Sequence[str] = ('rand', 'rand', 'near',
                                                   'near', 'trace'),
                           seed: int = 0) -> SDFDataset:
    """Narrowband SDF pool limited to occupied octree cells
    (ref OctreeSampledSDFDataset, octree_sdf_dataset.py:20-169).

    The mesh surface is quantized into a sparse octree at ``level``;
    'rand' samples are drawn uniformly inside each occupied leaf cell
    (``samples_per_voxel`` each — the reference's ``sample_spc``),
    'near'/'trace' samples come from the surface, and every candidate that
    falls into an empty octree cell is dropped (the narrowband filter,
    ref :127-129).  The resulting (coords, sdf) pool is cached;
    :meth:`SDFDataset.resample` subsamples ``num_samples`` working sets.
    """
    from shacira_tpu.ops import spc as spc_ops
    if isinstance(path_or_arrays, str):
        verts, faces = mesh_ops.load_obj(path_or_arrays)
    else:
        verts, faces = path_or_arrays
    verts = mesh_ops.normalize_mesh(verts)
    rng = np.random.RandomState(seed)

    # octree from a dense surface sampling (blas 'initialized from a mesh')
    surf = mesh_ops.sample_surface(rng, verts, faces,
                                   max(20000, 8 ** level))
    octree = spc_ops.Octree.from_pointcloud(surf, level)
    corners = octree.points(level)                       # [M, 3] int cells
    res = 2 ** level

    pts = []
    n_rand_ref = None
    for mode in modes:
        if mode == 'rand':
            # uniform inside each occupied leaf (ref sample_spc)
            u = rng.rand(len(corners), samples_per_voxel, 3)
            p = (corners[:, None, :] + u) / res * 2.0 - 1.0
            p = p.reshape(-1, 3).astype(np.float32)
            pts.append(p)
            n_rand_ref = len(p)
        elif mode in ('near', 'trace'):
            n = n_rand_ref or samples_per_voxel * max(1, len(corners))
            s = mesh_ops.sample_surface(rng, verts, faces, n)
            if mode == 'near':
                # ref variance 1 / 2**level (octree_sdf_dataset.py:119)
                s = s + rng.randn(*s.shape).astype(np.float32) / res
            pts.append(np.clip(s, -1, 1).astype(np.float32))
        else:
            raise ValueError(mode)
    coords = np.concatenate(pts)

    # narrowband filter: drop candidates in empty octree cells (ref :127-129)
    cells = spc_ops.quantize_points(coords, level)
    codes = octree.level_codes[level]
    idx = np.searchsorted(codes, spc_ops.morton3d_np(cells.astype(np.uint64)))
    idx = np.clip(idx, 0, len(codes) - 1)
    hit = codes[idx] == spc_ops.morton3d_np(cells.astype(np.uint64))
    coords = coords[hit]
    sdf = mesh_ops.points_to_sdf(coords, verts, faces)
    return SDFDataset(coords, sdf, batch_size, seed, num_samples=num_samples)
