"""Image INR training app.

Equivalent of ``app/image/main_image.py`` (reference): loads a directory of
images, trains one SHACIRA INR per image sequentially, writes per-image
``metrics.json`` + ``predicted.png`` and an aggregated ``metrics.json``,
supports resume at the correct image index, a ``complete`` marker, periodic
validation/checkpointing inside each run, and a ``--valid-only`` fast
inference path that decodes the codebook once (ref main_image.py:591-600).

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
from shacira_tpu.utils.logging import ExperimentLogger
from shacira_tpu.utils.perf import trace_to

log = logging.getLogger('shacira_tpu')


def save_png(path: str, img01: np.ndarray) -> None:
    from PIL import Image
    arr = np.clip(img01 * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def train_one_image(args, ds, log_dir_cur: str, mesh=None, logger=None):
    mcfg = cfg_mod.build_image_model_config(args)
    tcfg = cfg_mod.build_image_trainer_config(args)
    trainer = ImageTrainer(tcfg, mcfg, ds, seed=args.seed,
                           log_dir=log_dir_cur, mesh=mesh, logger=logger)
    if args.pretrained:
        state = checkpoint.load_model(args.pretrained)
        trainer.params = state['params']
        log.info('Loaded pretrained model from %s', args.pretrained)
    resume_path = os.path.join(log_dir_cur, 'resume_state.ckpt')
    if args.resume and os.path.exists(resume_path):
        checkpoint.restore_trainer(trainer, resume_path)
        log.info('Resumed image run at epoch %d', trainer.epoch)

    def log_entry(e):
        if 'valid_psnr' in e:
            log.info('epoch %d | valid PSNR %.2f (best %.2f)', e['epoch'],
                     e['valid_psnr'], e['best_val_psnr'])
        elif 'bpp' in e:
            log.info('epoch %d | PSNR %.2f | BPP %.3f | total %.2f kB | '
                     'loss %.3e', e['epoch'], e['psnr'], e['bpp'],
                     e['total_size_kb'], e['rgb_loss'])
        else:
            log.info('epoch %d | PSNR %.2f | loss %.3e', e['epoch'],
                     e.get('psnr', 0.0), e.get('rgb_loss', 0.0))

    remaining = tcfg.epochs - trainer.epoch
    with trace_to(os.path.join(log_dir_cur, 'profile')
                  if args.profile else None):
        out = trainer.train(epochs=max(0, remaining), log_fn=log_entry)
    if not args.metrics_only:
        save_png(os.path.join(log_dir_cur, 'predicted.png'),
                 trainer.render(trainer.best_params))
    # model_best: validation best when periodic validation ran, else the
    # train-loss best (ref image_trainer.py:173-178, 434-442)
    best = (trainer.val_best_params if trainer.val_best_params is not None
            else trainer.best_params)
    checkpoint.save_model(os.path.join(log_dir_cur, 'model_best.ckpt'),
                          best, model_format=args.model_format,
                          configs={'model': mcfg, 'trainer': tcfg})
    # keep full trainer state too (legacy ckpt consumed by tests/valid-only)
    checkpoint.save_trainer(trainer, resume_path)
    return out


def validate_one_image(args, ds, log_dir_cur: str):
    """--valid-only: load model_best, decode the codebook ONCE, render and
    report PSNR/BPP (ref main_image.py:591-600, DecoderIdentity swap)."""
    import jax
    import jax.numpy as jnp
    from shacira_tpu.models.grids import latent_grid as lg
    from shacira_tpu.models.nefs.image import neural_image_rgb
    from shacira_tpu.ops.image import clamped_psnr
    from shacira_tpu.datasets.image import pixel_coords

    mcfg = cfg_mod.build_image_model_config(args)
    path = os.path.join(log_dir_cur, 'model_best.ckpt')
    state = checkpoint.load_model(path)
    params = state['params']

    tcfg = cfg_mod.build_image_trainer_config(args)
    trainer = ImageTrainer(tcfg, mcfg, ds, seed=args.seed,
                           log_dir=log_dir_cur)
    trainer.params = params

    decoded = jax.jit(
        lambda p: lg.decode_codebook(p['grid'], mcfg.grid))(params)
    coords = jnp.asarray(pixel_coords(ds.h, ds.w))
    pred = jax.jit(lambda p, d, c: neural_image_rgb(p, mcfg, c, decoded=d))(
        params, decoded, coords)
    gt = jnp.asarray(ds.rgb)
    psnr = float(np.asarray(clamped_psnr(pred, gt)[None])[0])
    report = trainer.size_report(use_codec=True, params=params)
    out = {'PSNR': psnr, 'BPP': report['bpp'], **report}
    with open(os.path.join(log_dir_cur, 'metrics.json'), 'w') as f:
        json.dump(out, f, indent=2)
    if not args.metrics_only:
        save_png(os.path.join(log_dir_cur, 'predicted.png'),
                 np.asarray(pred).reshape(ds.h, ds.w, 3))
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
    if not args.valid_only and os.path.exists(os.path.join(log_dir, 'complete')):
        log.info('Experiment already complete at %s, exiting', log_dir)
        return 0

    dataset = MultiImageDataset(args.dataset_path, num_samples=args.num_samples,
                                sample_mode=args.sample_mode, seed=args.seed)
    log.info('Found %d images in %s', dataset.num_images, args.dataset_path)

    # resume at image index (ref main_image.py:532-536)
    start_idx = 0
    resume_marker = os.path.join(log_dir, 'resume_image_idx.json')
    if args.resume and not args.valid_only and os.path.exists(resume_marker):
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
        if args.valid_only:
            log.info('Evaluating image %d/%d: %s', idx + 1,
                     dataset.num_images, name)
            out = validate_one_image(args, ds, log_dir_cur)
        else:
            log.info('Training image %d/%d: %s (%dx%d)', idx + 1,
                     dataset.num_images, name, ds.h, ds.w)
            logger = ExperimentLogger(log_dir_cur, exp_name=f'{args.exp_name}/{name}')
            out = train_one_image(args, ds, log_dir_cur, logger=logger)
            logger.close()
        all_metrics.append(out)
        log.info('Image %s done: PSNR %.2f dB @ %.3f BPP', name,
                 out['PSNR'], out['BPP'])
        if args.resume and not args.valid_only:
            with open(resume_marker, 'w') as f:
                json.dump({'image_idx': dataset.image_idx}, f)

    # aggregate (ref main_image.py:613-620)
    agg = {k: float(np.mean([m[k] for m in all_metrics]))
           for k in ('PSNR', 'BPP', 'total_size_kb')}
    agg['num_images'] = len(all_metrics)
    with open(os.path.join(log_dir, 'metrics.json'), 'w') as f:
        json.dump({'average': agg, 'per_image': all_metrics}, f, indent=2)
    if not args.valid_only:
        open(os.path.join(log_dir, 'complete'), 'w').close()
    log.info('All done. avg PSNR %.2f dB @ %.3f BPP', agg['PSNR'], agg['BPP'])
    return 0


if __name__ == '__main__':
    sys.exit(main())
