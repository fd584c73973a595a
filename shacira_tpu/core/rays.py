"""Rays — origins/directions/near/far as a JAX pytree.

Equivalent of ``wisp/core/rays.py:19-196`` (reference), redesigned as a
registered dataclass pytree so rays flow through jit/vmap/scan and shard
across device meshes on the leading axis.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class Rays:
    origins: jax.Array     # [..., 3]
    dirs: jax.Array        # [..., 3]
    dist_min: jax.Array    # [...] or scalar broadcastable
    dist_max: jax.Array

    @property
    def shape(self):
        return self.origins.shape[:-1]

    def reshape(self, *shape) -> 'Rays':
        lead = shape
        return Rays(self.origins.reshape(*lead, 3), self.dirs.reshape(*lead, 3),
                    jnp.broadcast_to(self.dist_min, self.shape).reshape(*lead),
                    jnp.broadcast_to(self.dist_max, self.shape).reshape(*lead))

    def __getitem__(self, idx) -> 'Rays':
        return Rays(self.origins[idx], self.dirs[idx],
                    jnp.broadcast_to(self.dist_min, self.shape)[idx],
                    jnp.broadcast_to(self.dist_max, self.shape)[idx])

    @staticmethod
    def cat(rays_list) -> 'Rays':
        return Rays(*(jnp.concatenate([getattr(r, f) for r in rays_list], axis=0)
                      for f in ('origins', 'dirs', 'dist_min', 'dist_max')))

    def split(self, batch: int):
        n = self.origins.shape[0]
        for s in range(0, n, batch):
            yield self[s:s + batch]


def make_rays(origins, dirs, dist_min=0.0, dist_max=6.0) -> Rays:
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    lead = origins.shape[:-1]
    return Rays(origins, dirs,
                jnp.broadcast_to(jnp.asarray(dist_min, jnp.float32), lead),
                jnp.broadcast_to(jnp.asarray(dist_max, jnp.float32), lead))
