"""NeuralImage — 2D coordinates -> RGB neural field.

Equivalent of ``wisp/models/nefs/image.py:19-177`` (reference): latent hash
grid features (optionally concatenated with positionally-embedded coords) fed
to a small MLP color head with a final activation.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from shacira_tpu.models.grids import latent_grid as lg
from shacira_tpu.models import mlp as mlp_mod
from shacira_tpu.models.embedders import PositionalEmbedderConfig, positional_embed
from shacira_tpu.models.mlp import MLPConfig, mlp_init, mlp_apply, get_activation


@dataclass(frozen=True)
class NeuralImageConfig:
    grid: lg.LatentGridConfig
    hidden_dim: int = 128
    num_layers: int = 1
    activation: str = 'relu'
    final_activation: str = 'none'
    pos_embedder: str = 'none'            # 'none' | 'identity' | 'positional'
    pos_multires: int = 10
    position_input: bool = False

    @property
    def pos_embed_dim(self) -> int:
        if self.pos_embedder == 'positional':
            return PositionalEmbedderConfig(
                self.pos_multires, 2, include_input=self.position_input).output_dim
        if self.pos_embedder == 'identity' or (self.pos_embedder == 'none' and self.position_input):
            return 2
        return 0

    @property
    def mlp_cfg(self) -> MLPConfig:
        return MLPConfig(input_dim=self.grid.output_dim + self.pos_embed_dim,
                         output_dim=3,
                         hidden_dim=self.hidden_dim,
                         num_layers=self.num_layers,
                         activation=self.activation)


def neural_image_init(rng, cfg: NeuralImageConfig):
    kg, kd = jax.random.split(rng)
    return {
        'grid': lg.latent_grid_init(kg, cfg.grid),
        'decoder_color': mlp_init(kd, cfg.mlp_cfg),
    }


def neural_image_rgb(params, cfg: NeuralImageConfig, coords, *,
                     use_sga: bool = False, temperature: float = 1.0,
                     rng: Optional[jax.Array] = None,
                     decoded: Optional[jax.Array] = None,
                     static_plan=None, encoder=None, affine=None,
                     lod_mask: Optional[jax.Array] = None):
    """coords [N, 2] in [-1, 1] -> rgb [N, 3] (reference rgb(), image.py:127-154)."""
    feats = lg.interpolate(params['grid'], cfg.grid, coords,
                           use_sga=use_sga, temperature=temperature, rng=rng,
                           decoded=decoded, static_plan=static_plan,
                           encoder=encoder, affine=affine, lod_mask=lod_mask)
    if cfg.pos_embed_dim:
        if cfg.pos_embedder == 'positional':
            emb = positional_embed(
                PositionalEmbedderConfig(cfg.pos_multires, 2,
                                         include_input=cfg.position_input), coords)
        else:
            emb = coords
        feats = jnp.concatenate([feats, emb], axis=-1)
    colors = mlp_apply(params['decoder_color'], cfg.mlp_cfg, feats)
    return get_activation(cfg.final_activation)(colors)


def non_grid_size_bits(params) -> int:
    """fp bits of all non-grid params (the 'remainder' in BPP accounting,
    ref image_trainer.py:162)."""
    return mlp_mod.mlp_size_bits(params['decoder_color'])
