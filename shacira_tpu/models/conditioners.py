"""FiLM-style conditioners.

Equivalent of ``wisp/models/conditioners/basic_conditioners.py`` (reference,
unused by the main training paths but part of the model-component surface):
feature-wise linear modulation of decoder activations from a conditioning
code.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from shacira_tpu.models.mlp import MLPConfig, mlp_init, mlp_apply


@dataclass(frozen=True)
class FiLMConfig:
    cond_dim: int
    feature_dim: int
    hidden_dim: int = 64


def film_init(rng, cfg: FiLMConfig):
    mcfg = MLPConfig(cfg.cond_dim, 2 * cfg.feature_dim,
                     hidden_dim=cfg.hidden_dim, num_layers=1)
    return {'mlp': mlp_init(rng, mcfg)}


def film_apply(params, cfg: FiLMConfig, features, cond):
    """features [..., F] modulated by cond [..., C]: gamma * x + beta."""
    mcfg = MLPConfig(cfg.cond_dim, 2 * cfg.feature_dim,
                     hidden_dim=cfg.hidden_dim, num_layers=1)
    gb = mlp_apply(params['mlp'], mcfg, cond)
    gamma, beta = jnp.split(gb, 2, axis=-1)
    return features * (1.0 + gamma) + beta
