"""NeRF training app.

Equivalent of ``app/nerf/main_nerf.py`` (reference, headless path): loads a
Blender-synthetic (or RTMV) scene, trains a SHACIRA NeRF with pruning and
periodic validation/checkpointing, evaluates PSNR/SSIM(/LPIPS) on the
held-out val split (ref multiview_trainer.py:275-323), renders a 360-degree
turntable (ref render_final_view, multiview_trainer.py:237-273), and writes
metrics + checkpoints + TensorBoard/parquet logs.

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
from shacira_tpu.utils.logging import ExperimentLogger
from shacira_tpu.utils.perf import trace_to

log = logging.getLogger('shacira_tpu')


def _load_split(args, split):
    if args.multiview_dataset_format == 'rtmv':
        from shacira_tpu.datasets.rtmv import load_rtmv
        return load_rtmv(args.dataset_path, split=split, mip=args.mip,
                         bg_color=args.bg_color, max_views=args.max_views)
    from shacira_tpu.datasets.nerf_synthetic import load_nerf_synthetic
    return load_nerf_synthetic(args.dataset_path, split=split,
                               bg_color=args.bg_color, mip=args.mip,
                               max_views=args.max_views)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format='%(asctime)s | %(message)s')
    parser = cfg_mod.add_nerf_args(cfg_mod.build_image_parser())
    args = cfg_mod.parse_args(parser, argv)
    assert args.dataset_path, '--dataset-path is required'

    log_dir = os.path.join(args.log_dir, args.exp_name)
    os.makedirs(log_dir, exist_ok=True)
    logger = ExperimentLogger(log_dir, exp_name=args.exp_name)

    data = _load_split(args, args.dataset_split)
    log.info('Loaded %d %s views of %dx%d', data.num_views,
             args.dataset_split, data.h, data.w)
    # held-out validation split (ref main_nerf.py validates on 'val')
    val_data = None
    try:
        val_data = _load_split(args, 'val')
        log.info('Loaded %d val views', val_data.num_views)
    except (FileNotFoundError, ValueError):
        log.warning('No val split found; validating on the training split')

    mcfg = cfg_mod.build_nerf_model_config(args)
    tcfg = cfg_mod.build_nerf_trainer_config(args)
    trcfg = cfg_mod.build_tracer_config(args)
    trainer = MultiviewTrainer(tcfg, mcfg, trcfg, data,
                               num_rays=args.num_rays_sampled_per_img,
                               seed=args.seed, val_dataset=val_data,
                               log_dir=log_dir, logger=logger)

    if args.pretrained:
        state = checkpoint.load_model(args.pretrained)
        trainer.params = state['params']
        log.info('Loaded pretrained model from %s', args.pretrained)

    resume_path = os.path.join(log_dir, 'resume_state.ckpt')
    if args.resume and os.path.exists(resume_path):
        checkpoint.restore_trainer(trainer, resume_path)
        log.info('Resumed at iteration %d', trainer.iteration)

    if not args.valid_only:
        def log_entry(e):
            log.info(' | '.join(f'{k} {v:.4g}' if isinstance(v, float)
                                else f'{k} {v}' for k, v in e.items()))

        with trace_to(os.path.join(log_dir, 'profile')
                      if args.profile else None):
            trainer.train(log_fn=log_entry)
        checkpoint.save_trainer(trainer, resume_path)
        best = (trainer.val_best_params if trainer.val_best_params is not None
                else trainer.params)
        checkpoint.save_model(
            os.path.join(log_dir, 'model_best.ckpt'), best,
            model_format=args.model_format,
            configs={'model': mcfg, 'tracer': trcfg, 'trainer': tcfg})
    elif os.path.exists(os.path.join(log_dir, 'model_best.ckpt')):
        state = checkpoint.load_model(os.path.join(log_dir, 'model_best.ckpt'))
        trainer.params = state['params']
        log.info('valid-only: loaded model_best.ckpt')

    # full held-out evaluation: EVERY view of the val split, like the
    # reference (multiview_trainer.py:177-235 iterates the whole dataset);
    # PSNR is the float variant — the exact fn the reference imports there
    # (metrics.py:19-37 via multiview_trainer.py:18)
    eval_data = val_data if val_data is not None else data
    val_views = list(range(eval_data.num_views))
    metrics = trainer.evaluate(view_indices=val_views, dataset=eval_data)
    metrics['split'] = 'val' if val_data is not None else args.dataset_split
    metrics['views'] = 'all'
    metrics['num_eval_views'] = len(val_views)
    metrics.update(trainer.size_report(use_codec=True))
    log.info('Validation (%s): PSNR %.2f | SSIM %.4f', metrics['split'],
             metrics['psnr'], metrics['ssim'])
    logger.record({'final': True, **{k: v for k, v in metrics.items()}})
    with open(os.path.join(log_dir, 'metrics.json'), 'w') as f:
        json.dump(metrics, f, indent=2)

    if not args.metrics_only:
        from shacira_tpu.apps.train_image import save_png
        save_png(os.path.join(log_dir, 'val_view0.png'),
                 trainer.render_view(val_views[0], dataset=eval_data))
        # 360-degree turntable gif (ref render_final_view)
        from shacira_tpu.render import offline
        frames = render_turntable(trainer, args)
        offline.save_gif(frames, os.path.join(log_dir, 'turntable.gif'))
    logger.close()
    return 0


def render_turntable(trainer, args, num_angles: int = None, res: int = None):
    """Render a 360-degree turntable with the trained pipeline
    (ref render_final_view, multiview_trainer.py:237-273: ``num_angles + 1``
    frames at pi*0.1 angular increments, full dataset resolution; LOD
    masking = RENDERING_FINAL uses all LODs at the final level)."""
    import jax
    from shacira_tpu.core.rays import make_rays
    from shacira_tpu.render import offline
    from shacira_tpu.models.grids import latent_grid as lg
    from shacira_tpu.models.nefs import nerf as nerf_mod
    from shacira_tpu.tracers import rf_tracer

    d = trainer.dataset
    if num_angles is None:
        num_angles = getattr(args, 'num_angles', 20)
    if res is None:
        res = getattr(args, 'turntable_res', 0) or max(d.h, d.w)
    cam = offline.CameraConfig(width=res, height=res, fov=30.0,
                               dist_min=float(d.dist_min),
                               dist_max=float(d.dist_max))
    mcfg, tcfg = trainer.model_cfg, trainer.tracer_cfg
    if trainer.is_latent:
        decoded = jax.jit(lambda p: lg.decode_codebook(p['grid'], mcfg.grid))(
            trainer.params)

        @jax.jit
        def _trace(params, decoded, occ_state, rays, k):
            def field_fn(coords, dirs):
                return nerf_mod.nerf_rgba(params, mcfg, coords, dirs,
                                          decoded=decoded)
            return rf_tracer.trace(field_fn, occ_state, mcfg.occ_cfg,
                                   tcfg, rays, k)
    else:
        decoded = trainer.structure_tables   # eval-mode alternative backbone

        @jax.jit
        def _trace(params, decoded, occ_state, rays, k):
            def field_fn(coords, dirs):
                return nerf_mod.nerf_rgba(params, mcfg, coords, dirs,
                                          structure=decoded, training=False)
            return rf_tracer.trace(field_fn, occ_state, mcfg.occ_cfg,
                                   tcfg, rays, k)

    def trace_fn(rays, k):
        return _trace(trainer.params, decoded, trainer.occ_state, rays, k)

    layers = None
    if getattr(args, 'overlay_layers', False):
        from shacira_tpu.core.primitives import axes_gizmo, occupancy_wireframe
        layers = {
            'occupancy': occupancy_wireframe(
                np.asarray(trainer.occ_state['occ']), max_cells=2048),
            'axes': axes_gizmo(0.5),
        }

    origin = np.asarray(args.camera_origin, np.float32)
    radius = float(np.linalg.norm(origin[[0, 2]]))
    return list(offline.turntable(trace_fn, cam, num_angles=num_angles,
                                  radius=radius, elevation=float(origin[1]),
                                  layers=layers))


if __name__ == '__main__':
    sys.exit(main())
