"""RenderBuffer — multi-channel render output with blending.

Light-weight equivalent of ``wisp/core/render_buffer.py:21-439`` +
``wisp/core/channels.py`` (reference): a dict-backed pytree of per-pixel
channels with alpha blending, concatenation, and image export.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class RenderBuffer:
    channels: Dict[str, jax.Array]

    def __getattr__(self, name):
        ch = object.__getattribute__(self, 'channels')
        if name in ch:
            return ch[name]
        raise AttributeError(name)

    @property
    def rgb(self):
        return self.channels.get('rgb')

    @property
    def alpha(self):
        return self.channels.get('alpha')

    def blend(self, other: 'RenderBuffer') -> 'RenderBuffer':
        """Alpha-composite self over other (ref channel blend kit,
        render_core.py:317-354: alpha-over for rgb, logical-or for hit)."""
        a = self.alpha
        out = {}
        keys = set(self.channels) | set(other.channels)
        for k in keys:
            x = self.channels.get(k)
            y = other.channels.get(k)
            if x is None:
                out[k] = y
            elif y is None:
                out[k] = x
            elif k == 'hit':
                out[k] = x | y
            elif k == 'alpha':
                out[k] = x + (1 - x) * y
            else:
                out[k] = x * a + y * (1 - a)
        return RenderBuffer(out)

    @staticmethod
    def cat(buffers) -> 'RenderBuffer':
        keys = buffers[0].channels.keys()
        return RenderBuffer({k: jnp.concatenate([b.channels[k] for b in buffers])
                             for k in keys})

    def reshape_image(self, h: int, w: int) -> Dict[str, np.ndarray]:
        out = {}
        for k, v in self.channels.items():
            v = np.asarray(v)
            out[k] = v.reshape(h, w, *v.shape[1:][1:] or ())  # [N,C]->[H,W,C]
            if v.ndim == 2:
                out[k] = v.reshape(h, w, v.shape[-1])
            else:
                out[k] = v.reshape(h, w)
        return out

    def image(self, h: int, w: int) -> np.ndarray:
        return np.asarray(self.rgb).reshape(h, w, 3)
