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

    def blend(self, other: 'RenderBuffer', kit=None) -> 'RenderBuffer':
        """Composite self (front) over other (back) using the per-channel
        blend kit (ref render_buffer.py blend + channels_starter_kit;
        render_core.py:317-354): alpha-over for rgb, slerp for normals,
        logical-or for hit, front-wins for depth, linear for alpha."""
        from shacira_tpu.core import channel_fn as cf
        kit = kit if kit is not None else cf.channels_starter_kit()
        a1, a2 = self.alpha, other.alpha
        out = {}
        keys = set(self.channels) | set(other.channels)
        for k in keys:
            x = self.channels.get(k)
            y = other.channels.get(k)
            if x is None:
                out[k] = y
            elif y is None:
                out[k] = x
            else:
                ch = kit.get(k, cf.create_default_channel())
                out[k] = ch.blend_fn(x, y, a1, a2)
        return RenderBuffer(out)

    def normalized(self, kit=None) -> 'RenderBuffer':
        """Map every channel to displayable [0, 1] via its normalize fn."""
        from shacira_tpu.core import channel_fn as cf
        kit = kit if kit is not None else cf.channels_starter_kit()
        out = {}
        for k, v in self.channels.items():
            ch = kit.get(k, cf.create_default_channel())
            out[k] = ch.normalize_fn(v)
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

    def exr_dict(self, h: int, w: int) -> Dict[str, np.ndarray]:
        """Float32 channel dict for EXR export (ref render_buffer.exr_dict):
        rgb stays 3-channel, everything else flattens to per-pixel planes."""
        out = {}
        for k, v in self.channels.items():
            arr = np.asarray(v, np.float32)
            if arr.ndim == 1:
                arr = arr[:, None]
            out[k] = arr.reshape(h, w, arr.shape[-1])
        return out

    def save_exr(self, path: str, h: int, w: int) -> bool:
        """Write a real EXR via the native codec (ops/exr.py); returns True
        (kept for callers written against the old npz-fallback contract)."""
        from shacira_tpu.ops.exr import write_exr
        data = self.exr_dict(h, w)
        planes = {}
        for k, v in data.items():
            if v.shape[-1] == 3:
                for i, suffix in enumerate('RGB'):
                    planes[f'{k}.{suffix}' if k != 'rgb' else suffix] = v[..., i]
            else:
                for i in range(v.shape[-1]):
                    planes[k if v.shape[-1] == 1 else f'{k}.{i}'] = v[..., i]
        write_exr(path, planes)
        return True
