"""NeRF training app.

Equivalent of ``app/nerf/main_nerf.py`` (reference, headless path): loads a
Blender-synthetic (or RTMV) scene, trains a SHACIRA NeRF with pruning, runs
PSNR/SSIM validation, renders a turntable, writes metrics + checkpoints.

Usage:
    python -m shacira_tpu.apps.train_nerf --config configs/nerf_lego.yaml \
        --dataset-path /data/nerf_synthetic/lego
"""
from __future__ import annotations

import json
import logging
import os
import sys

import numpy as np

from shacira_tpu import config as cfg_mod
from shacira_tpu.trainers.multiview_trainer import MultiviewTrainer
from shacira_tpu.utils import checkpoint

log = logging.getLogger('shacira_tpu')


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format='%(asctime)s | %(message)s')
    parser = cfg_mod.add_nerf_args(cfg_mod.build_image_parser())
    args = cfg_mod.parse_args(parser, argv)
    assert args.dataset_path, '--dataset-path is required'

    log_dir = os.path.join(args.log_dir, args.exp_name)
    os.makedirs(log_dir, exist_ok=True)

    if args.multiview_dataset_format == 'rtmv':
        from shacira_tpu.datasets.rtmv import load_rtmv
        data = load_rtmv(args.dataset_path, split=args.dataset_split,
                         mip=args.mip, bg_color=args.bg_color,
                         max_views=args.max_views)
    else:
        from shacira_tpu.datasets.nerf_synthetic import load_nerf_synthetic
        data = load_nerf_synthetic(args.dataset_path, split=args.dataset_split,
                                   bg_color=args.bg_color, mip=args.mip,
                                   max_views=args.max_views)
    log.info('Loaded %d views of %dx%d', data.num_views, data.h, data.w)

    mcfg = cfg_mod.build_nerf_model_config(args)
    tcfg = cfg_mod.build_nerf_trainer_config(args)
    trcfg = cfg_mod.build_tracer_config(args)
    trainer = MultiviewTrainer(tcfg, mcfg, trcfg, data,
                               num_rays=args.num_rays_sampled_per_img,
                               seed=args.seed)

    resume_path = os.path.join(log_dir, 'resume_state.ckpt')
    if args.resume and os.path.exists(resume_path):
        checkpoint.restore_trainer(trainer, resume_path)
        log.info('Resumed at iteration %d', trainer.iteration)

    if not args.valid_only:
        trainer.train(log_fn=lambda e: log.info(
            'iter %d (epoch %d) | loss %.3e | PSNR %.2f | occ %.3f',
            e['iteration'], e['epoch'], e['rgb_loss'], e['psnr'], e['occupancy']))
        checkpoint.save_trainer(trainer, resume_path)

    val_views = list(range(0, data.num_views, max(1, data.num_views // 8)))
    metrics = trainer.evaluate(view_indices=val_views)
    log.info('Validation: PSNR %.2f | SSIM %.4f', metrics['psnr'], metrics['ssim'])
    with open(os.path.join(log_dir, 'metrics.json'), 'w') as f:
        json.dump(metrics, f, indent=2)

    if not args.metrics_only:
        from shacira_tpu.apps.train_image import save_png
        save_png(os.path.join(log_dir, 'val_view0.png'),
                 trainer.render_view(val_views[0]))
    return 0


if __name__ == '__main__':
    sys.exit(main())
