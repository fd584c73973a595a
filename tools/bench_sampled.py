"""Pearl-shaped sampled-mode image training throughput (device sampling).

The pearl giga-image config (ref app/image/configs/pearl.yaml:13-80) trains
with 2^18-coordinate 'wreplace' batches over a 67M-pixel image.  This
benchmark measures that path's throughput on the available accelerator with
the HBM-resident device-sampling loop (host presampling for comparison via
--host).

Usage: python tools/bench_sampled.py [--host] [--pixels 8192] [--iters 400]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (ImageTrainer,
                                                    ImageTrainerConfig)

    side = 8192
    if '--pixels' in sys.argv:
        side = int(sys.argv[sys.argv.index('--pixels') + 1])
    iters = 400
    if '--iters' in sys.argv:
        iters = int(sys.argv[sys.argv.index('--iters') + 1])
    host = '--host' in sys.argv

    # pearl-shaped: bw 23, 16 LODs, F=4, 2^18-coordinate wreplace batches
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(0, 13, side, dtype=np.float32),
                         np.linspace(0, 11, side, dtype=np.float32),
                         indexing='ij')
    img = np.stack([0.5 + 0.5 * np.sin(yy * 3 + xx),
                    0.5 + 0.5 * np.cos(xx * 2 - yy),
                    0.5 + 0.5 * np.sin(xx + yy)], -1).astype(np.float32)
    ns = 2 ** 18
    ds = ImageDataset(img, num_samples=ns, sample_mode='wreplace')
    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=16, min_grid_res=16, max_grid_res=side,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=23, init_grid='uniform',
        num_prob_layers=2, entropy_enabled=True).with_ldec(dict(
            norm='max', ldecode_matrix='sq', use_shift=True, ldec_std=0.1,
            use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=64, num_layers=1)
    cfg = ImageTrainerConfig(epochs=10 ** 9, log_every=-1, chunk_size=100,
                             use_sga=True, temperature=0.1, norm='max',
                             entropy_reg=1e-4, entropy_reg_end=1e-4,
                             device_sampling=not host)
    tr = ImageTrainer(cfg, mcfg, ds, seed=0)
    bpe = len(ds)

    warm = 100
    tr.train(epochs=max(1, warm // bpe), finalize=False)
    np.asarray(tr.params['grid']['codebook'][0:1])
    t0 = time.time()
    tr.train(epochs=max(1, iters // bpe), finalize=False)
    np.asarray(tr.params['grid']['codebook'][0:1])
    dt = time.time() - t0
    done = max(1, iters // bpe) * bpe
    print(json.dumps({
        'metric': 'image_sampled_train_mpix_per_s',
        'value': round(ns * done / dt / 1e6, 2),
        'unit': 'Mpix/s',
        'config': f'pearl-shaped: {side}x{side} image, bw23 16 LODs F4, '
                  f"2^18 wreplace batches, "
                  f"{'host presampling' if host else 'device sampling'}",
        'steps_per_s': round(done / dt, 2),
    }))


if __name__ == '__main__':
    main()
