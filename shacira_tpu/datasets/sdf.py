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
