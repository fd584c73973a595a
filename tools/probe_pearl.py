"""Bisect the pearl-config TPU worker crash.

Stages (each runs a few sampled-mode training iterations):
  1: pearl GRID shapes (bw23, 16 LODs, max_grid_res 10725) on a small image
  2: same grid on the full 67-Mpix image
Run: python tools/probe_pearl.py <stage>
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import numpy as np
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    from tools.make_synthetic_data import synth_photo
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (ImageTrainer,
                                                    ImageTrainerConfig)

    if stage == 1:
        img = synth_photo(256, 384, seed=0)
    else:
        from PIL import Image
        Image.MAX_IMAGE_PIXELS = None
        img = np.asarray(Image.open('/tmp/pearl_img/synth00.png'),
                         np.float32) / 255.0

    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=16, min_grid_res=16, max_grid_res=10725,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.01, codebook_bitwidth=23, init_grid='uniform',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=96, num_layers=1)
    tcfg = ImageTrainerConfig(
        epochs=20, use_sga=True, decay_period=0.9, temperature=0.1,
        entropy_reg=1e-4, entropy_reg_end=1e-4, rng_impl='unsafe_rbg',
        log_every=1, chunk_size=2, optimizer_type='adamw',
        lr=2e-4, grid_lr=1e-2, weight_decay_decoder=0.01)
    ds = ImageDataset(np.asarray(img, np.float32), sample_mode='wreplace',
                      num_samples=262144)
    tr = ImageTrainer(tcfg, mcfg, ds, seed=0)
    print(f'stage {stage}: image {img.shape}, training 4 chunks...',
          flush=True)
    tr.train(epochs=8, log_fn=lambda e: print(e, flush=True),
             finalize=False)
    np.asarray(tr.params['grid']['codebook'][0:1])
    print(f'stage {stage} OK', flush=True)


if __name__ == '__main__':
    main()
