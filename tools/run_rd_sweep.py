"""Rate-distortion sweep: kodak-config image INRs across entropy weights.

SHACIRA's headline capability is R-D CONTROL — one architecture spanning a
bitrate range via the entropy-regularization weight (paper Fig. 5; config
``entropy_reg`` in app/image/configs/kodak.yaml).  This sweep trains the
full kodak-config pipeline (24 LODs, bw 11, SGA + recalibration + STE
switch at 0.9) at several λ settings on the synthetic kodak-like images
and records the (BPP, PSNR) curve with real range-coder codestream sizes.

Usage: python tools/run_rd_sweep.py [--epochs 60000] [--out artifacts]
Runs on the available accelerator (one v5e point ≈ 2 min at 60k epochs).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


# (entropy_reg, entropy_reg_end) pairs — cosine schedule like the kodak
# config's 1e-3 -> 1e-4, scaled across the bitrate range
LAMBDAS = [(1e-2, 1e-3), (3e-3, 3e-4), (1e-3, 1e-4), (2e-4, 2e-5)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=60000)
    ap.add_argument('--images', type=int, default=4)
    ap.add_argument('--seeds', type=int, default=2)
    ap.add_argument('--out', type=str, default='artifacts')
    args = ap.parse_args()

    from tools.make_synthetic_data import synth_photo
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (ImageTrainer,
                                                    ImageTrainerConfig)

    grid = LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=24, min_grid_res=16, max_grid_res=512,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=11, init_grid='uniform',
        num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='max', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=16, num_layers=1)

    points = []
    for lam, lam_end in LAMBDAS:
        psnrs, bpps, bpps_h, kbs = [], [], [], []
        for i in range(args.images):
            img = synth_photo(512, 768, seed=i)
            for s in range(args.seeds):
                ds = ImageDataset(np.asarray(img, np.float32),
                                  sample_mode='full')
                tcfg = ImageTrainerConfig(
                    epochs=args.epochs, use_sga=True, decay_period=0.9,
                    temperature=0.1, norm='max', norm_every=10,
                    entropy_reg=lam, entropy_reg_end=lam_end,
                    log_every=-1, chunk_size=1000)
                tr = ImageTrainer(tcfg, mcfg, ds, seed=100 * s + i)
                t0 = time.time()
                summary = tr.train()
                psnrs.append(float(summary['PSNR']))
                bpps.append(float(summary['BPP']))
                bpps_h.append(float(summary.get('bpp_hist',
                                                summary['BPP'])))
                kbs.append(float(summary['total_size_kb']))
                print(f'lam {lam:g}->{lam_end:g} img {i} seed {s}: '
                      f'PSNR {psnrs[-1]:.2f} BPP {bpps[-1]:.4f} '
                      f'({time.time() - t0:.0f}s)', flush=True)
        points.append({'entropy_reg': lam, 'entropy_reg_end': lam_end,
                       'psnr': round(float(np.mean(psnrs)), 3),
                       'psnr_std': round(float(np.std(psnrs)), 3),
                       'bpp': round(float(np.mean(bpps)), 4),
                       'bpp_hist': round(float(np.mean(bpps_h)), 4),
                       'size_kb': round(float(np.mean(kbs)), 2)})

    out = {'config': 'kodak-config (24 LODs F1 bw11, SGA+recalibration, '
                     f'{args.epochs} epochs), {args.images} synthetic '
                     f'768x512 images x {args.seeds} seeds; headline size '
                     '= the smaller decodable stream per image (prob-model '
                     'CDF + BitEstimator params, or histogram + '
                     'alphabet/CDF side info — size_report picks per '
                     'image); bpp_hist is the histogram variant explicitly',
           'points': points}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, 'kodak_rd_sweep.json'), 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
