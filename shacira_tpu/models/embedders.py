"""Positional embedding (NeRF-style).

Equivalent of ``wisp/models/embedders/positional_embedder.py:15-100``:
sin/cos at ``num_freq`` octaves with optional raw-input concatenation.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class PositionalEmbedderConfig:
    num_freq: int
    input_dim: int
    max_freq_log2: int = None  # defaults to num_freq - 1
    log_sampling: bool = True
    include_input: bool = True

    @property
    def output_dim(self) -> int:
        out = 2 * self.num_freq * self.input_dim
        if self.include_input:
            out += self.input_dim
        return out


def positional_embed(cfg: PositionalEmbedderConfig, coords):
    """[..., D] -> [..., output_dim]."""
    max_log2 = cfg.max_freq_log2 if cfg.max_freq_log2 is not None else cfg.num_freq - 1
    if cfg.log_sampling:
        bands = 2.0 ** jnp.linspace(0.0, max_log2, cfg.num_freq)
    else:
        bands = jnp.linspace(1.0, 2.0 ** max_log2, cfg.num_freq)
    xb = coords[..., None, :] * bands[:, None]            # [..., F, D]
    sin = jnp.sin(xb).reshape(*coords.shape[:-1], -1)
    cos = jnp.cos(xb).reshape(*coords.shape[:-1], -1)
    out = [sin, cos]
    if cfg.include_input:
        out = [coords] + out
    return jnp.concatenate(out, axis=-1)
