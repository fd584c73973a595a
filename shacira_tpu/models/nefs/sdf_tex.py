"""NeuralSDFTex — SDF + RGB variant.

Equivalent of ``wisp/models/nefs/neural_sdf_tex.py:20`` (reference): a
4-output decode head (sdf + rgb) over grid features, used with the
``sample_tex`` SDF training mode.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from shacira_tpu.models.grids import latent_grid as lg
from shacira_tpu.models.embedders import PositionalEmbedderConfig, positional_embed
from shacira_tpu.models.mlp import MLPConfig, mlp_init, mlp_apply
from shacira_tpu.models.nefs.sdf import NeuralSDFConfig


@dataclass(frozen=True)
class NeuralSDFTexConfig(NeuralSDFConfig):
    @property
    def mlp_cfg(self) -> MLPConfig:
        return MLPConfig(input_dim=self.grid.output_dim + self.pos_embed_dim,
                         output_dim=4, hidden_dim=self.hidden_dim,
                         num_layers=self.num_layers, activation=self.activation)


def neural_sdf_tex_init(rng, cfg: NeuralSDFTexConfig):
    kg, kd = jax.random.split(rng)
    return {'grid': lg.latent_grid_init(kg, cfg.grid),
            'decoder': mlp_init(kd, cfg.mlp_cfg)}


def neural_sdf_tex(params, cfg: NeuralSDFTexConfig, coords, *, lod_mask=None):
    """coords [..., 3] -> (sdf [..., 1], rgb [..., 3])."""
    feats = lg.interpolate(params['grid'], cfg.grid, coords, lod_mask=lod_mask)
    if cfg.pos_embed_dim:
        if cfg.pos_embedder == 'positional':
            emb = positional_embed(PositionalEmbedderConfig(
                cfg.pos_multires, 3, include_input=cfg.position_input), coords)
        else:
            emb = coords
        feats = jnp.concatenate([emb, feats], axis=-1)
    out = mlp_apply(params['decoder'], cfg.mlp_cfg, feats)
    return out[..., :1], jax.nn.sigmoid(out[..., 1:4])
