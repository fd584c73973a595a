"""OctreeGrid (NGLOD) and CodebookOctreeGrid (VQAD).

Equivalents of ``wisp/models/grids/octree_grid.py:20-420`` and
``codebook_grid.py:22-354`` (reference): features live on the corners of
occupied sparse-octree cells ("dual octree" + trinkets); VQAD stores softmax
logits over a learned per-LOD dictionary instead of raw features
(straight-through one-hot mix at train time, argmax lookup at eval,
codebook_grid.py:285-302).

Structure (sorted morton codes, corners, trinkets) is host-built and static;
queries are vectorized binary searches; only the feature tables are
parameters.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.ops import spc, coding


@dataclass(frozen=True)
class OctreeGridConfig:
    feature_dim: int
    base_lod: int = 2
    num_lods: int = 1
    multiscale_type: str = 'sum'
    feature_std: float = 0.0
    feature_bias: float = 0.0

    @property
    def active_lods(self) -> Tuple[int, ...]:
        return tuple(self.base_lod + i for i in range(self.num_lods))

    @property
    def output_dim(self) -> int:
        return (self.feature_dim * self.num_lods
                if self.multiscale_type == 'cat' else self.feature_dim)


class OctreeStructure:
    """Static (non-trainable) octree structure shared by both grid types."""

    def __init__(self, octree: spc.Octree, active_lods):
        self.octree = octree
        self.active_lods = tuple(active_lods)
        self.codes = {}       # level -> jnp sorted morton codes
        self.trinkets = {}    # level -> jnp [M, 8] corner indices
        self.num_corners = {}
        for lod in self.active_lods:
            corners, trinkets = spc.build_dual(octree, lod)
            self.codes[lod] = jnp.asarray(octree.level_codes[lod])
            self.trinkets[lod] = jnp.asarray(trinkets)
            self.num_corners[lod] = len(corners)

    @classmethod
    def make_dense(cls, cfg: OctreeGridConfig):
        return cls(spc.Octree.make_dense(cfg.active_lods[-1]), cfg.active_lods)

    @classmethod
    def from_pointcloud(cls, cfg: OctreeGridConfig, pts: np.ndarray,
                        dilate: int = 2):
        return cls(spc.Octree.from_pointcloud(pts, cfg.active_lods[-1],
                                              dilate=dilate), cfg.active_lods)

    @classmethod
    def from_mesh(cls, cfg: OctreeGridConfig, path_or_arrays,
                  num_samples_on_mesh: int = 100_000, seed: int = 0,
                  dilate: int = 0):
        """Octree from a triangle mesh: sample the surface, quantize to the
        top LOD (ref OctreeGrid.from_mesh, octree_grid.py:121-170 — the
        reference samples ``num_samples_on_mesh`` surface points via
        ``sample_spc`` then builds the SPC from them)."""
        from shacira_tpu.ops import mesh as mesh_ops
        if isinstance(path_or_arrays, str):
            verts, faces = mesh_ops.load_obj(path_or_arrays)
        else:
            verts, faces = path_or_arrays
        verts = mesh_ops.normalize_mesh(np.asarray(verts, np.float64))
        rng = np.random.RandomState(seed)
        surf = mesh_ops.sample_surface(rng, verts,
                                       np.asarray(faces, np.int64),
                                       num_samples_on_mesh)
        return cls.from_pointcloud(cfg, np.clip(surf, -1, 1), dilate=dilate)

    @classmethod
    def from_spc(cls, cfg: OctreeGridConfig, octree: spc.Octree):
        """Wrap an existing SPC/octree (ref OctreeGrid.from_spc,
        octree_grid.py:213-249)."""
        if octree.max_level < cfg.active_lods[-1]:
            raise ValueError(
                f'octree max_level {octree.max_level} < top active LOD '
                f'{cfg.active_lods[-1]}')
        return cls(octree, cfg.active_lods)

    def tables(self) -> dict:
        """Structure as a plain pytree (per-LOD code/trinket arrays in
        ``active_lods`` order) so jitted trainers can pass it as an
        argument instead of baking multi-hundred-MB constants."""
        return {'codes': tuple(self.codes[l] for l in self.active_lods),
                'trinkets': tuple(self.trinkets[l] for l in self.active_lods)}


def octree_grid_init(rng, cfg: OctreeGridConfig, structure: OctreeStructure):
    """Per-LOD corner feature tables, N(bias, std) (ref octree_grid.py:273-276)."""
    feats = []
    keys = jax.random.split(rng, len(cfg.active_lods))
    for k, lod in zip(keys, cfg.active_lods):
        n = structure.num_corners[lod]
        feats.append(jax.random.normal(k, (n, cfg.feature_dim))
                     * cfg.feature_std + cfg.feature_bias)
    return {'features': feats}


def _corner_feats_linear(params_lod, idx):
    return jnp.take(params_lod, idx, axis=0)


def _as_tables(structure) -> dict:
    """Accept either an OctreeStructure or its .tables() pytree."""
    return structure.tables() if hasattr(structure, 'tables') else structure


def _interp_lod(feat_lookup, codes, trinkets, coords, lod: int):
    """Trilinear interpolation at one LOD; zeros outside the octree."""
    cells = jnp.floor((coords * 0.5 + 0.5) * (2 ** lod)).astype(jnp.int32)
    cells = jnp.clip(cells, 0, 2 ** lod - 1)
    pidx = spc.query_cells(codes, cells)
    valid = pidx >= 0
    safe_pidx = jnp.maximum(pidx, 0)
    corner_idx = jnp.take(trinkets, safe_pidx, axis=0)                 # [N, 8]
    cf = feat_lookup(corner_idx)                                       # [N, 8, F]
    w = spc.trilinear_coeffs(coords, cells, lod)                       # [N, 8]
    out = jnp.sum(cf * w[..., None], axis=-2)
    return jnp.where(valid[..., None], out, 0.0)


def interpolate(params, cfg: OctreeGridConfig, structure, coords):
    """coords [..., 3] -> [..., output_dim] (ref interpolate, :320-391).

    ``structure``: OctreeStructure or its .tables() pytree."""
    tables = _as_tables(structure)
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    feats = []
    for i, lod in enumerate(cfg.active_lods):
        table = params['features'][i]
        feats.append(_interp_lod(lambda idx: jnp.take(table, idx, axis=0),
                                 tables['codes'][i], tables['trinkets'][i],
                                 c, lod))
    stacked = jnp.stack(feats, axis=1)
    out = (stacked.sum(axis=1) if cfg.multiscale_type == 'sum'
           else stacked.reshape(stacked.shape[0], -1))
    return out.reshape(*lead, -1)


def grid_size_bits(params) -> int:
    return sum(int(np.prod(f.shape)) * 32 for f in params['features'])


# ---------------------------------------------------------------------------
# VQAD: CodebookOctreeGrid
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CodebookOctreeGridConfig(OctreeGridConfig):
    codebook_bitwidth: int = 4

    @property
    def dictionary_size(self) -> int:
        return 2 ** self.codebook_bitwidth


def codebook_grid_init(rng, cfg: CodebookOctreeGridConfig,
                       structure: OctreeStructure):
    """Per-LOD: corner logits [n, dict_size] + dictionary [dict_size, F]
    (ref codebook_grid.py:222-232)."""
    logits, dicts = [], []
    keys = jax.random.split(rng, 2 * len(cfg.active_lods))
    for i, lod in enumerate(cfg.active_lods):
        n = structure.num_corners[lod]
        logits.append(jax.random.normal(keys[2 * i], (n, cfg.dictionary_size))
                      * cfg.feature_std)
        dicts.append(jax.random.normal(keys[2 * i + 1],
                                       (cfg.dictionary_size, cfg.feature_dim))
                     * cfg.feature_std + cfg.feature_bias)
    return {'logits': logits, 'dictionary': dicts}


def _codebook_lookup(logits, dictionary, idx, training: bool):
    """Straight-through softmax dictionary lookup (ref :285-302)."""
    l = jnp.take(logits, idx, axis=0)                    # [N, 8, D]
    if training:
        y_soft = jax.nn.softmax(l, axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1), l.shape[-1])
        keys = y_soft + jax.lax.stop_gradient(hard - y_soft)
        return jnp.einsum('...d,df->...f', keys, dictionary)
    keys = jnp.argmax(l, axis=-1)
    return jnp.take(dictionary, keys, axis=0)


def codebook_interpolate(params, cfg: CodebookOctreeGridConfig,
                         structure, coords, *,
                         training: bool = True):
    tables = _as_tables(structure)
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    feats = []
    for i, lod in enumerate(cfg.active_lods):
        logits = params['logits'][i]
        dictionary = params['dictionary'][i]
        feats.append(_interp_lod(
            lambda idx: _codebook_lookup(logits, dictionary, idx, training),
            tables['codes'][i], tables['trinkets'][i], c, lod))
    stacked = jnp.stack(feats, axis=1)
    out = (stacked.sum(axis=1) if cfg.multiscale_type == 'sum'
           else stacked.reshape(stacked.shape[0], -1))
    return out.reshape(*lead, -1)


def codebook_grid_size_bits(params, use_codec: bool = False):
    """(0, dict fp bits + entropy-coded argmax indices) — ref size(), :238-270."""
    dict_bits = sum(int(np.prod(d.shape)) * 32 for d in params['dictionary'])
    index_bits = 0.0
    for logits in params['logits']:
        assign = np.asarray(jnp.argmax(logits, axis=-1))
        index_bits += (coding.coded_size_bits(assign) if use_codec
                       else coding.entropy_bits_histogram(assign))
    return 0.0, index_bits + dict_bits
