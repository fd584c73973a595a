"""Weak-scaling report on the virtual 8-device CPU mesh.

Drives ``parallel.multihost.scaling_report`` with a data-parallel image
training step (hash-grid encode + MLP + adam, grads psum'd by XLA via the
sharded batch).  On virtual CPU devices all "chips" share the host's cores,
so absolute efficiency under-reports real hardware — the table is evidence
that the sharded program compiles, runs, and the per-device work splits
(items/s must *grow* with the mesh despite fixed physical cores).

Usage: python tools/run_scaling_report.py
"""
import json
import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags +
                               ' --xla_force_host_platform_device_count=8')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from shacira_tpu.models.grids.latent_grid import (LatentGridConfig,
                                                  latent_grid_init)
from shacira_tpu.models.nefs import image as image_mod
from shacira_tpu.models.nefs.image import NeuralImageConfig
from shacira_tpu.parallel import mesh as pmesh
from shacira_tpu.parallel import multihost


def main():
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=8, min_grid_res=16, max_grid_res=256,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=14, init_grid='uniform',
    ).with_ldec(dict(norm='max', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=16, num_layers=1)
    params = jax.jit(lambda r: image_mod.neural_image_init(r, mcfg))(
        jax.random.PRNGKey(0))

    def step_builder(mesh, batch):
        coords = np.random.RandomState(0).uniform(
            -1, 1, (batch, 2)).astype(np.float32)
        gt = np.random.RandomState(1).rand(batch, 3).astype(np.float32)
        coords, gt = pmesh.shard_batch(mesh, coords, gt)
        p = pmesh.replicate(mesh, params)

        @jax.jit
        def one(p, coords, gt):
            def loss(p):
                pred = image_mod.neural_image_rgb(p, mcfg, coords)
                return jnp.mean((pred - gt) ** 2)
            g = jax.grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-3 * b, p, g)

        def run():
            nonlocal p
            p = one(p, coords, gt)
            np.asarray(jax.tree_util.tree_leaves(p)[0].ravel()[0:1])

        return run

    report = multihost.scaling_report(step_builder, batch_per_device=65536,
                                      steps=10)
    print(json.dumps({str(k): v for k, v in report.items()}, indent=2))
    with open(os.path.join(os.path.dirname(__file__), '..',
                           'traces', 'scaling_report_cpu8.json'), 'w') as f:
        json.dump({str(k): v for k, v in report.items()}, f, indent=2)


if __name__ == '__main__':
    main()
