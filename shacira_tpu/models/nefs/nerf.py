"""NeuralRadianceField — 3D coords + view dirs -> RGB + density.

Equivalent of ``wisp/models/nefs/nerf.py:19-265`` (reference):
grid features -> density MLP (16 outputs, output bias[0] init 1.0,
density = relu(feats[..., 0:1])) -> color MLP on [density feats ⊕
PE(-ray_d)] -> sigmoid.  Pruning updates the dense occupancy grid instead of
rebuilding an octree.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from shacira_tpu.models.grids import latent_grid as lg
from shacira_tpu.models.grids import octree_grid as og
from shacira_tpu.models.grids import triplanar_grid as tg
from shacira_tpu.models import mlp as mlp_mod
from shacira_tpu.models.embedders import PositionalEmbedderConfig, positional_embed
from shacira_tpu.models.mlp import MLPConfig, mlp_init, mlp_apply
from shacira_tpu.accel import occupancy as occ


def grid_kind(grid_cfg) -> str:
    """Backbone family of a grid config: 'latent' (SHACIRA LatentGrid or
    uncompressed HashGrid), 'codebook' (VQAD), 'octree' (NGLOD), or
    'triplanar' — the grid_type dispatch surface of the reference
    (app/nerf/main_nerf.py:371-505)."""
    if isinstance(grid_cfg, og.CodebookOctreeGridConfig):
        return 'codebook'
    if isinstance(grid_cfg, og.OctreeGridConfig):
        return 'octree'
    if isinstance(grid_cfg, tg.TriplanarGridConfig):
        return 'triplanar'
    return 'latent'


@dataclass(frozen=True)
class NeuralRadianceFieldConfig:
    # LatentGridConfig (SHACIRA / INGP-hash) or one of the alternative
    # backbones: OctreeGridConfig, CodebookOctreeGridConfig,
    # TriplanarGridConfig (all frozen dataclasses -> hashable/static)
    grid: object
    hidden_dim: int = 128
    num_layers: int = 1
    activation: str = 'relu'
    pos_embedder: str = 'none'
    view_embedder: str = 'none'       # 'none' | 'identity' | 'positional'
    pos_multires: int = 10
    view_multires: int = 4
    position_input: bool = False
    # pruning (ref nerf.py:87-90)
    prune_density_decay: float = 0.6
    prune_min_density: float = 2.956  # ((0.01 * 512)/sqrt(3)) style defaults come from configs
    blas_level: int = 7
    # mixed-precision MLP head (the reference's AMP autocast on the NeRF
    # path, base_trainer.py:166-170,386; bf16 is the TPU analog of fp16 —
    # no loss scaling needed, f32-range exponent)
    amp: bool = False

    @property
    def pos_embed_dim(self) -> int:
        if self.pos_embedder == 'positional':
            return PositionalEmbedderConfig(self.pos_multires, 3,
                                            include_input=self.position_input).output_dim
        if self.pos_embedder == 'identity' or (self.pos_embedder == 'none' and self.position_input):
            return 3
        return 0

    @property
    def view_embed_dim(self) -> int:
        if self.view_embedder == 'positional':
            # view embedder always includes input (ref nerf.py:98-99)
            return PositionalEmbedderConfig(self.view_multires, 3,
                                            include_input=True).output_dim
        if self.view_embedder in ('identity', 'none'):
            # 'none' with include_input=True behaves like identity (ref :119)
            return 3
        return 0

    @property
    def density_mlp_cfg(self) -> MLPConfig:
        return MLPConfig(input_dim=self.grid.output_dim + self.pos_embed_dim,
                         output_dim=16, hidden_dim=self.hidden_dim,
                         num_layers=self.num_layers, activation=self.activation)

    @property
    def color_mlp_cfg(self) -> MLPConfig:
        return MLPConfig(input_dim=16 + self.view_embed_dim, output_dim=3,
                         hidden_dim=self.hidden_dim,
                         num_layers=self.num_layers + 1, activation=self.activation)

    @property
    def occ_cfg(self) -> occ.OccupancyGridConfig:
        return occ.OccupancyGridConfig(self.blas_level)


def nerf_init(rng, cfg: NeuralRadianceFieldConfig, structure=None):
    """``structure``: OctreeStructure for the octree/codebook backbones
    (grid_kind); None for latent/triplanar."""
    kg, kd, kc = jax.random.split(rng, 3)
    density = mlp_init(kd, cfg.density_mlp_cfg)
    # reference inits the first density output bias to 1.0 (nerf.py:138)
    b = density['layers'][-1]['b']
    density['layers'][-1]['b'] = b.at[0].set(1.0)
    kind = grid_kind(cfg.grid)
    if kind == 'latent':
        grid = lg.latent_grid_init(kg, cfg.grid)
    elif kind == 'octree':
        grid = og.octree_grid_init(kg, cfg.grid, structure)
    elif kind == 'codebook':
        grid = og.codebook_grid_init(kg, cfg.grid, structure)
    else:
        grid = tg.triplanar_grid_init(kg, cfg.grid)
    return {
        'grid': grid,
        'decoder_density': density,
        'decoder_color': mlp_init(kc, cfg.color_mlp_cfg),
    }


def nerf_feats(params, cfg: NeuralRadianceFieldConfig, coords, *,
               use_sga: bool = False, temperature: float = 1.0,
               rng: Optional[jax.Array] = None,
               decoded: Optional[jax.Array] = None,
               affine=None, lod_mask: Optional[jax.Array] = None,
               grouping=None, seg_size: int = 0,
               structure=None, training: bool = True):
    """Grid features (+ positional embedding) at coords — the encode half of
    the field.  With ``grouping`` (from paged_hash.group_segments over
    segment-ordered rows) the paged fast path runs; otherwise the plain
    interpolate.  ``structure``/``training`` serve the alternative
    backbones (octree/codebook/triplanar; grid_kind)."""
    kind = grid_kind(cfg.grid)
    if kind == 'octree':
        feats = og.interpolate(params['grid'], cfg.grid, structure, coords)
    elif kind == 'codebook':
        feats = og.codebook_interpolate(params['grid'], cfg.grid, structure,
                                        coords, training=training)
    elif kind == 'triplanar':
        feats = tg.interpolate(params['grid'], cfg.grid, coords)
    elif grouping is not None:
        feats = lg.interpolate_paged(params['grid'], cfg.grid, coords,
                                     grouping, seg_size, use_sga=use_sga,
                                     temperature=temperature, rng=rng,
                                     affine=affine, lod_mask=lod_mask)
    else:
        feats = lg.interpolate(params['grid'], cfg.grid, coords,
                               use_sga=use_sga, temperature=temperature,
                               rng=rng, decoded=decoded, affine=affine,
                               lod_mask=lod_mask)
    if cfg.pos_embed_dim:
        if cfg.pos_embedder == 'positional':
            emb = positional_embed(PositionalEmbedderConfig(
                cfg.pos_multires, 3, include_input=cfg.position_input), coords)
        else:
            emb = coords
        feats = jnp.concatenate([feats, emb], axis=-1)
    return feats


def nerf_zbar(params, cfg: NeuralRadianceFieldConfig, coords, grouping,
              seg_size: int, *, affine, occ_slab=None, occ_res: int = 0):
    """Paged-LOD latents on segment-ordered rows (deferred-direct split,
    stage 1 — see latent_grid.paged_zbar).  Returns [N, Lp*ld] flat; with
    ``occ_slab`` the last ld-wide column block is the in-kernel fine
    occupancy row ({0., 1.}; split it off before decoding)."""
    zb = lg.paged_zbar(params['grid'], cfg.grid, coords, grouping, seg_size,
                       affine=affine, occ_slab=occ_slab, occ_res=occ_res)
    return zb.reshape(zb.shape[0], -1)


def nerf_finish_feats(params, cfg: NeuralRadianceFieldConfig, zbar, coords,
                      *, affine, lod_mask=None):
    """Deferred-direct split, stage 2 (post row-compaction): direct-LOD
    encode at the compacted coords + paged decode + positional embedding."""
    feats = lg.paged_finish(params['grid'], cfg.grid, zbar, coords,
                            affine=affine, lod_mask=lod_mask)
    if cfg.pos_embed_dim:
        if cfg.pos_embedder == 'positional':
            emb = positional_embed(PositionalEmbedderConfig(
                cfg.pos_multires, 3, include_input=cfg.position_input), coords)
        else:
            emb = coords
        feats = jnp.concatenate([feats, emb], axis=-1)
    return feats


def nerf_head(params, cfg: NeuralRadianceFieldConfig, feats, ray_d):
    """MLP half of the field: grid feats + view dirs -> (rgb, density).

    With ``cfg.amp`` the MLPs run in bf16 (the reference autocasts this
    path to fp16, base_trainer.py:386); outputs return to f32 for the
    integration math."""
    dt = jnp.bfloat16 if cfg.amp else None
    density_feats = mlp_apply(params['decoder_density'], cfg.density_mlp_cfg,
                              feats, compute_dtype=dt)
    if cfg.view_embed_dim:
        if cfg.view_embedder == 'positional':
            vemb = positional_embed(PositionalEmbedderConfig(
                cfg.view_multires, 3, include_input=True), -ray_d)
        else:
            vemb = -ray_d
        if dt is not None:
            vemb = vemb.astype(dt)
        fdir = jnp.concatenate([density_feats, vemb], axis=-1)
    else:
        fdir = density_feats
    colors = jax.nn.sigmoid(mlp_apply(params['decoder_color'],
                                      cfg.color_mlp_cfg, fdir,
                                      compute_dtype=dt))
    density = jax.nn.relu(density_feats[..., 0:1])
    if cfg.amp:
        colors = colors.astype(jnp.float32)
        density = density.astype(jnp.float32)
    return colors, density


def nerf_rgba(params, cfg: NeuralRadianceFieldConfig, coords, ray_d, *,
              use_sga: bool = False, temperature: float = 1.0,
              rng: Optional[jax.Array] = None,
              decoded: Optional[jax.Array] = None,
              affine=None, lod_mask: Optional[jax.Array] = None,
              structure=None, training: bool = True):
    """coords [..., 3], ray_d [..., 3] -> (rgb [..., 3], density [..., 1]).

    Mirrors NeuralRadianceField.rgba (nerf.py:192-234) incl. the negated view
    direction fed to the view embedder (:222).
    """
    feats = nerf_feats(params, cfg, coords, use_sga=use_sga,
                       temperature=temperature, rng=rng, decoded=decoded,
                       affine=affine, lod_mask=lod_mask,
                       structure=structure, training=training)
    return nerf_head(params, cfg, feats, ray_d)


def nerf_density(params, cfg: NeuralRadianceFieldConfig, coords, **kw):
    """Density only (used by pruning)."""
    _, density = nerf_rgba(params, cfg, coords,
                           jnp.zeros_like(coords), **kw)
    return density


@functools.lru_cache(maxsize=None)
def _prune_block_layout(res: int, g8: int = 8):
    """Static slot layout routing the prune density query through the paged
    kernels with NO runtime grouping: occupancy cells are enumerated in
    grouping-cell-major order (the 2**level grid tiles the g8^3 grouping
    cells exactly, g8 = grid page_res // 2), so every kernel block's rows
    lie in one grouping cell by construction — the 'grouping' is a
    compile-time constant.

    Returns (idx3 [N, 3] cell indices in grouped order, block_cell [nb],
    inv [N] with density_raster = density_grouped[inv])."""
    import numpy as np
    assert res % g8 == 0, res
    w = res // g8
    b = 1
    while b < 128 and w ** 3 % (2 * b) == 0:
        b *= 2                                  # block rows (128 at res 128)
    cells = np.arange(g8 ** 3)
    cx, cy, cz = cells // (g8 * g8), (cells // g8) % g8, cells % g8
    loc = np.arange(w ** 3)
    lx, ly, lz = loc // (w * w), (loc // w) % w, loc % w
    ix = (cx[:, None] * w + lx[None, :]).reshape(-1)
    iy = (cy[:, None] * w + ly[None, :]).reshape(-1)
    iz = (cz[:, None] * w + lz[None, :]).reshape(-1)
    idx3 = np.stack([ix, iy, iz], axis=-1).astype(np.int32)   # grouped order
    flat = (ix.astype(np.int64) * res + iy) * res + iz
    inv = np.empty(res ** 3, np.int32)
    inv[flat] = np.arange(res ** 3, dtype=np.int32)
    block_cell = np.repeat(cells.astype(np.int32), w ** 3 // b)
    return idx3, block_cell, inv


def _prune_density_paged(params, cfg: NeuralRadianceFieldConfig, rng):
    """Density at one jittered point per occupancy cell via the block-local
    paged kernels (~10x the flat gather path at 2M cells) — raster order."""
    from shacira_tpu.ops import paged_hash as ph
    res = cfg.occ_cfg.res
    gr = ph.group_res_of(cfg.grid.spec.page_res)
    idx3, block_cell, inv = _prune_block_layout(res, gr)
    n = res ** 3
    u = jax.random.uniform(rng, (n, 3))
    pts = ((jnp.asarray(idx3) + u) / res) * 2.0 - 1.0
    parts = lg.affine_parts(params['grid'], cfg.grid)       # eval/round mode
    static = ph.default_static(cfg.grid.spec, include_direct=True)
    zbar = ph.paged_interp_lods(
        pts, jnp.ones((n,), bool), jnp.asarray(block_cell),
        jnp.ones((gr ** 3,), bool), parts[0], None, static)
    feats = lg.paged_finish(params['grid'], cfg.grid, zbar, pts,
                            affine=parts)
    _, density = nerf_head(params, cfg, feats, jnp.zeros_like(pts))
    return jnp.take(density[..., 0], jnp.asarray(inv))


def _can_prune_paged(cfg: NeuralRadianceFieldConfig) -> bool:
    from shacira_tpu.ops import paged_hash as ph
    if grid_kind(cfg.grid) != 'latent':
        return False
    res = cfg.occ_cfg.res
    gr = ph.group_res_of(cfg.grid.spec.page_res)
    return (cfg.grid.spec.hash_layout == 'paged'
            and lg.supports_affine_fusion(cfg.grid)
            and res % gr == 0
            and res // gr >= 4)


def prune(params, cfg: NeuralRadianceFieldConfig, occ_state, rng,
          structure=None):
    """One NGP pruning step on the dense occupancy grid (ref nerf.py:150-185).

    Decay each cell's tracked density, sample one jittered point per cell,
    query the field's density (with rounded/eval-mode latents), take the max,
    and threshold.  On the paged layout the query runs through the paged
    kernels with a static grouping (see _prune_block_layout).
    """
    if _can_prune_paged(cfg):
        density = _prune_density_paged(params, cfg, rng)
    else:
        pts = occ.cell_centers_jittered(cfg.occ_cfg, rng)
        density = nerf_density(params, cfg, pts, structure=structure,
                               training=False)[..., 0]
    return occ.prune_update(occ_state, cfg.occ_cfg, density,
                            density_decay=cfg.prune_density_decay,
                            min_density=cfg.prune_min_density)


def non_grid_size_bits(params) -> int:
    return (mlp_mod.mlp_size_bits(params['decoder_density'])
            + mlp_mod.mlp_size_bits(params['decoder_color']))
