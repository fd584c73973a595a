"""NeuralSDF — 3D coords -> signed distance.

Equivalent of ``wisp/models/nefs/neural_sdf.py:20-181`` (reference):
grid features (optionally with positional embedding / raw position) -> 1-dim
SDF MLP.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from shacira_tpu.models.grids import latent_grid as lg
from shacira_tpu.models import mlp as mlp_mod
from shacira_tpu.models.embedders import PositionalEmbedderConfig, positional_embed
from shacira_tpu.models.mlp import MLPConfig, mlp_init, mlp_apply


@dataclass(frozen=True)
class NeuralSDFConfig:
    grid: lg.LatentGridConfig
    hidden_dim: int = 128
    num_layers: int = 1
    activation: str = 'relu'
    pos_embedder: str = 'none'
    pos_multires: int = 4
    position_input: bool = True

    @property
    def pos_embed_dim(self) -> int:
        if self.pos_embedder == 'positional':
            return PositionalEmbedderConfig(self.pos_multires, 3,
                                            include_input=self.position_input).output_dim
        if self.pos_embedder == 'identity' or (self.pos_embedder == 'none' and self.position_input):
            return 3
        return 0

    @property
    def mlp_cfg(self) -> MLPConfig:
        return MLPConfig(input_dim=self.grid.output_dim + self.pos_embed_dim,
                         output_dim=1, hidden_dim=self.hidden_dim,
                         num_layers=self.num_layers, activation=self.activation)


def neural_sdf_init(rng, cfg: NeuralSDFConfig):
    kg, kd = jax.random.split(rng)
    return {'grid': lg.latent_grid_init(kg, cfg.grid),
            'decoder': mlp_init(kd, cfg.mlp_cfg)}


def neural_sdf(params, cfg: NeuralSDFConfig, coords, *,
               lod_mask=None, decoded: Optional[jax.Array] = None):
    """coords [..., 3] -> sdf [..., 1] (ref sdf(), neural_sdf.py:120-155)."""
    feats = lg.interpolate(params['grid'], cfg.grid, coords,
                           lod_mask=lod_mask, decoded=decoded)
    if cfg.pos_embed_dim:
        if cfg.pos_embedder == 'positional':
            emb = positional_embed(PositionalEmbedderConfig(
                cfg.pos_multires, 3, include_input=cfg.position_input), coords)
        else:
            emb = coords
        feats = jnp.concatenate([emb, feats], axis=-1)
    return mlp_apply(params['decoder'], cfg.mlp_cfg, feats)


def finitediff_gradient(params, cfg, coords, eps: float = 5e-4):
    """Finite-difference SDF gradient for normals (ref ops/differential)."""
    offs = jnp.eye(3) * eps
    grads = [(neural_sdf(params, cfg, coords + offs[i])
              - neural_sdf(params, cfg, coords - offs[i])) / (2 * eps)
             for i in range(3)]
    return jnp.concatenate(grads, axis=-1)


def non_grid_size_bits(params) -> int:
    return mlp_mod.mlp_size_bits(params['decoder'])
