"""SDF quality-artifact run: NGLOD-style NeuralSDF on a composite scene.

Trains the SDF pipeline (grid + SDF MLP, loss over LODs, sphere-traced
rendering) on the analytic multi-object scene used by the NeRF generators
(tools/make_synthetic_data._scene_sdf) and records IoU + a normal-shaded
render — run-scale evidence for the SDFTrainer beyond unit tests
(ref wisp/trainers/sdf_trainer.py + app/main demo usage).

Usage: python tools/run_sdf_demo.py [--iters N] [--out artifacts]
CPU-runnable (~3 min at the default scale).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=2000)
    ap.add_argument('--out', type=str, default='artifacts')
    args = ap.parse_args()

    from tools.make_synthetic_data import _scene_sdf
    from shacira_tpu.datasets import sdf as sdf_ds
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.sdf import NeuralSDFConfig
    from shacira_tpu.trainers.sdf_trainer import SDFTrainer, SDFTrainerConfig

    def scene(p):
        d, _ = _scene_sdf(np.asarray(p, np.float32))
        return d

    # surface points via rejection + projection (offline, numpy)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.8, 0.8, (200000, 3)).astype(np.float32)
    d = scene(pts)
    near = pts[np.abs(d) < 0.05][:20000]
    # project toward the surface along the SDF gradient (finite diff)
    eps = 1e-3
    grads = np.stack([(scene(near + e) - scene(near - e)) / (2 * eps)
                      for e in np.eye(3, dtype=np.float32) * eps], -1)
    grads /= np.maximum(np.linalg.norm(grads, axis=-1, keepdims=True), 1e-8)
    surf = near - grads * scene(near)[:, None]

    ds = sdf_ds.from_analytic(scene, num_samples=200000, batch_size=4096,
                              surface_pts=surf, seed=0)
    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=5, min_grid_res=8, max_grid_res=64,
        latent_dim=0, multiscale_type='cat', resolution_dim=3,
        feature_std=0.01, codebook_bitwidth=12, init_grid='normal')
    mcfg = NeuralSDFConfig(grid=grid, hidden_dim=64, num_layers=1,
                           position_input=True)
    tr = SDFTrainer(SDFTrainerConfig(epochs=100, chunk_size=100,
                                     lr=1e-3, grid_lr=2e-2),
                    mcfg, ds, seed=0)
    t0 = time.time()
    tr.train(num_iterations=args.iters,
             log_fn=lambda e: print(e, flush=True))
    wall = time.time() - t0
    m = tr.validate(num_batches=8)
    img = tr.render(res=(256, 256), shading='normal')

    os.makedirs(args.out, exist_ok=True)
    out = {'iou': float(m['iou']), 'iters': args.iters,
           'wall_s': round(wall, 1),
           'config': 'NGLOD-style: 5 LODs fd4 bw12 res 8..64, hidden 64, '
                     'composite analytic scene, 4096-pt batches'}
    with open(os.path.join(args.out, 'sdf_r2_metrics.json'), 'w') as f:
        json.dump(out, f, indent=2)
    from shacira_tpu.apps.train_image import save_png
    save_png(os.path.join(args.out, 'sdf_r2_normals.png'),
             np.clip(img * 0.5 + 0.5, 0, 1))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
