"""Image INR training app.

Equivalent of ``app/image/main_image.py`` (reference): loads a directory of
images, trains one SHACIRA INR per image sequentially, writes per-image
``metrics.json`` + ``predicted.png`` and an aggregated ``metrics.json``,
supports resume at the correct image index and a ``complete`` marker.

Usage:
    python -m shacira_tpu.apps.train_image --config configs/kodak.yaml \
        --dataset-path /data/kodak [--epochs N] ...
"""
from __future__ import annotations

import json
import logging
import os
import sys

import numpy as np

from shacira_tpu import config as cfg_mod
from shacira_tpu.datasets.image import MultiImageDataset
from shacira_tpu.trainers.image_trainer import ImageTrainer
from shacira_tpu.utils import checkpoint

log = logging.getLogger('shacira_tpu')


def save_png(path: str, img01: np.ndarray) -> None:
    from PIL import Image
    arr = np.clip(img01 * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def train_one_image(args, ds, log_dir_cur: str, mesh=None):
    mcfg = cfg_mod.build_image_model_config(args)
    tcfg = cfg_mod.build_image_trainer_config(args)
    trainer = ImageTrainer(tcfg, mcfg, ds, seed=args.seed,
                           log_dir=log_dir_cur, mesh=mesh)
    out = trainer.train(log_fn=lambda e: log.info(
        'epoch %d | PSNR %.2f | BPP %.3f | total %.2f kB | loss %.3e',
        e['epoch'], e['psnr'], e['bpp'], e['total_size_kb'], e['rgb_loss']))
    if not args.metrics_only:
        save_png(os.path.join(log_dir_cur, 'predicted.png'),
                 trainer.render(trainer.best_params))
    checkpoint.save_trainer(trainer, os.path.join(log_dir_cur, 'model_best.ckpt'))
    return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s | %(message)s')
    parser = cfg_mod.build_image_parser()
    args = cfg_mod.parse_args(parser, argv)
    assert args.dataset_path, '--dataset-path is required'
    assert args.batch_size == 1, 'Image trainer uses batch size 1 (ref :70)'

    log_dir = os.path.join(args.log_dir, args.exp_name)
    os.makedirs(log_dir, exist_ok=True)
    if os.path.exists(os.path.join(log_dir, 'complete')):
        log.info('Experiment already complete at %s, exiting', log_dir)
        return 0

    dataset = MultiImageDataset(args.dataset_path, num_samples=args.num_samples,
                                sample_mode=args.sample_mode, seed=args.seed)
    log.info('Found %d images in %s', dataset.num_images, args.dataset_path)

    # resume at image index (ref main_image.py:532-536)
    start_idx = 0
    resume_marker = os.path.join(log_dir, 'resume_image_idx.json')
    if args.resume and os.path.exists(resume_marker):
        with open(resume_marker) as f:
            start_idx = json.load(f)['image_idx']
        log.info('Resuming at image index %d', start_idx)
    dataset.image_idx = start_idx

    all_metrics = []
    while dataset.image_idx < dataset.num_images:
        idx = dataset.image_idx
        ds = dataset.load_next()
        name = os.path.splitext(os.path.basename(ds.image_path))[0]
        log_dir_cur = os.path.join(log_dir, name)
        os.makedirs(log_dir_cur, exist_ok=True)
        log.info('Training image %d/%d: %s (%dx%d)', idx + 1,
                 dataset.num_images, name, ds.h, ds.w)
        out = train_one_image(args, ds, log_dir_cur)
        all_metrics.append(out)
        log.info('Image %s done: PSNR %.2f dB @ %.3f BPP', name,
                 out['PSNR'], out['BPP'])
        if args.resume:
            with open(resume_marker, 'w') as f:
                json.dump({'image_idx': dataset.image_idx}, f)

    # aggregate (ref main_image.py:613-620)
    agg = {k: float(np.mean([m[k] for m in all_metrics]))
           for k in ('PSNR', 'BPP', 'total_size_kb')}
    agg['num_images'] = len(all_metrics)
    with open(os.path.join(log_dir, 'metrics.json'), 'w') as f:
        json.dump({'average': agg, 'per_image': all_metrics}, f, indent=2)
    open(os.path.join(log_dir, 'complete'), 'w').close()
    log.info('All done. avg PSNR %.2f dB @ %.3f BPP', agg['PSNR'], agg['BPP'])
    return 0


if __name__ == '__main__':
    sys.exit(main())
