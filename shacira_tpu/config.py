"""Configuration system: argparse groups + YAML with CLI > YAML > defaults.

Equivalent of ``wisp/config_parser.py`` (reference): arguments are organized
in named groups that double as YAML sections; a YAML file given with
``--config`` sets parser defaults (so explicit CLI flags win); YAML supports
one level of ``parent:`` inheritance (config_parser.py:174-194).  The flag
surface mirrors ``app/image/main_image.py`` / ``app/nerf/main_nerf.py`` so
reference configs (kodak.yaml, nerf_lego.yaml, ...) load as-is.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np
import yaml


def build_image_parser() -> argparse.ArgumentParser:
    """Argument surface of the image app (main_image.py:34-265)."""
    parser = argparse.ArgumentParser(description='SHACIRA-TPU image INR training')
    parser.add_argument('--config', type=str, help='Path to YAML config')
    parser.add_argument('--platform', type=str, default=None,
                        choices=['cpu', 'tpu', 'axon'],
                        help='Force a JAX platform (some environments '
                             'register accelerators that ignore '
                             'JAX_PLATFORMS; see apply_platform)')

    g = parser.add_argument_group('logging')
    g.add_argument('--exp-name', type=str, default='unnamed')
    g.add_argument('--log-dir', type=str, default='_results/logs/runs')
    g.add_argument('--log-every', type=int, default=1000)
    g.add_argument('--valid-every', type=int, default=-1)
    g.add_argument('--save-every', type=int, default=5000)
    g.add_argument('--render-tb-every', type=int, default=-1)
    g.add_argument('--metrics-only', action='store_true')

    g = parser.add_argument_group('dataset')
    g.add_argument('--dataset-path', type=str, default=None)
    g.add_argument('--dataloader-num-workers', type=int, default=0)
    g.add_argument('--num-samples', type=int, default=-1)
    g.add_argument('--sample-mode', type=str, default='full',
                   choices=['full', 'woreplace', 'sequential', 'wreplace', 'eval'])

    g = parser.add_argument_group('nef')
    g.add_argument('--hidden-dim', type=int, default=128)
    g.add_argument('--num-layers', type=int, default=1)
    g.add_argument('--pos-embedder', type=str, default='none')
    g.add_argument('--pos-multires', type=int, default=10)
    g.add_argument('--position-input', type=_bool, default=False)
    g.add_argument('--activation-type', type=str, default='relu')
    g.add_argument('--final-activation', type=str, default='none')

    g = parser.add_argument_group('grid')
    g.add_argument('--grid-type', type=str, default='LatentGrid')
    g.add_argument('--interpolation-type', type=str, default='linear')
    g.add_argument('--multiscale-type', type=str, default='cat')
    g.add_argument('--feature-dim', type=int, default=2)
    g.add_argument('--feature-std', type=float, default=0.0)
    g.add_argument('--feature-bias', type=float, default=0.0)
    g.add_argument('--num-lods', type=int, default=16)
    g.add_argument('--base-lod', type=int, default=2)
    g.add_argument('--codebook-bitwidth', type=int, default=8)
    # TPU-native spatially-paged hash layout (ops/paged_hash.py)
    g.add_argument('--hash-layout', type=str, default='xor',
                   choices=['xor', 'paged'])
    g.add_argument('--page-res', type=int, default=16,
                   help='paged layout: pages per axis (32 = faster kernels, '
                        'needs finer LODs / shorter segments)')
    g.add_argument('--tree-type', type=str, default='geometric')
    g.add_argument('--min-grid-res', type=int, default=16)
    g.add_argument('--max-grid-res', type=int, default=512)
    g.add_argument('--blas-level', type=int, default=7)
    g.add_argument('--init-grid', type=str, default='normal')
    g.add_argument('--prune-min-density', type=float,
                   default=(0.01 * 512) / np.sqrt(3))
    g.add_argument('--prune-density-decay', type=float, default=0.6)

    g = parser.add_argument_group('latent_decoder')
    g.add_argument('--ldecode-enabled', type=_bool, default=False)
    g.add_argument('--ldecode-type', type=str, default='single')
    g.add_argument('--use-sga', type=_bool, default=False)
    g.add_argument('--diff-sampling', type=_bool, default=False)
    g.add_argument('--use-shift', type=_bool, default=False)
    g.add_argument('--ldecode-matrix', type=str, default='sq')
    g.add_argument('--latent-dim', type=int, default=0)
    g.add_argument('--norm', type=str, default='none')
    g.add_argument('--norm-every', type=int, default=10)
    g.add_argument('--ldec-std', type=float, default=1.0)
    g.add_argument('--decay-period', type=float, default=0.9)
    g.add_argument('--temperature', type=float, default=1.0)
    g.add_argument('--num-layers-dec', type=int, default=0)
    g.add_argument('--hidden-dim-dec', type=int, default=0)
    g.add_argument('--activation-dec', type=str, default='none')
    g.add_argument('--clamp-weights', type=float, default=0.0)
    g.add_argument('--num-dec', type=int, default=2)

    g = parser.add_argument_group('entropy_reg')
    g.add_argument('--num-prob-layers', type=int, default=4)
    g.add_argument('--entropy-reg', type=float, default=0.0)
    g.add_argument('--entropy-reg-end', type=float, default=0.0)
    g.add_argument('--entropy-reg-sched', type=str, default='cosine')
    g.add_argument('--noise-freq', type=int, default=1)
    g.add_argument('--rng-impl', type=str, default='threefry',
                   help='per-step bulk-draw generator: threefry|rbg|unsafe_rbg')

    g = parser.add_argument_group('optimizer')
    g.add_argument('--optimizer-type', type=str, default='adam')
    g.add_argument('--lr', type=float, default=0.001)
    g.add_argument('--grid-lr', type=float, default=0.02)
    g.add_argument('--scale-grid-lr', type=str, default='none')
    g.add_argument('--ldec-lr', type=float, default=0.01)
    g.add_argument('--ldec-lr-warmup', type=int, default=10)
    g.add_argument('--weight-decay', type=float, default=0.0)
    g.add_argument('--weight-decay-decoder', type=float, default=0.0)
    g.add_argument('--rgb-loss', type=float, default=1.0)
    g.add_argument('--disable-amp', type=_bool, default=True)
    g.add_argument('--disable-scaler', type=_bool, default=True)

    g = parser.add_argument_group('trainer')
    g.add_argument('--epochs', type=int, default=250)
    g.add_argument('--batch-size', type=int, default=1)
    g.add_argument('--model-format', type=str, default='full')
    g.add_argument('--resume', type=_bool, default=False)
    g.add_argument('--valid-only', action='store_true')
    g.add_argument('--pretrained', type=str, default=None)
    g.add_argument('--chunk-size', type=int, default=500)
    g.add_argument('--profile', action='store_true')
    g.add_argument('--seed', type=int, default=0)
    # sampled-mode dataset resampling (main_image.py:148-151)
    g.add_argument('--resample', type=_bool, default=False)
    g.add_argument('--resample-every', type=int, default=1)
    return parser


def add_nerf_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Extra groups of the NeRF app (main_nerf.py:55-289)."""
    # the reference trains NeRF with AMP on (BaseTrainer enable_amp=True
    # default; only the image configs set disable_amp) — bf16 MLP head here
    parser.set_defaults(disable_amp=False)
    g = parser.add_argument_group('tracer')
    g.add_argument('--raymarch-type', type=str, default='ray',
                   choices=['ray', 'voxel'])
    g.add_argument('--num-steps', type=int, default=1024)
    g.add_argument('--step-size', type=float, default=1.0)
    g.add_argument('--bg-color', type=str, default='white')
    g.add_argument('--max-intersections', type=int, default=64)
    g.add_argument('--max-samples', type=int, default=0)
    # segmented 'ray' marching (TPU-native; RFTracerConfig)
    g.add_argument('--segment-size', type=int, default=0)
    g.add_argument('--seg-budget', type=int, default=0)
    g.add_argument('--coarse-level', type=int, default=5)
    g.add_argument('--seg-dilation', type=int, default=1)
    # paged-encode path (TPU-native; ops/paged_hash.py): requires
    # --hash-layout paged on the grid
    g.add_argument('--eval-seg-budget', type=int, default=0)
    g.add_argument('--group-segs-per-block', type=int, default=8)
    g.add_argument('--group-seg-size', type=int, default=0)
    g.add_argument('--fine-mode', type=str, default='exact',
                   choices=('exact', 'deferred', 'kernel'))
    # transmittance culling threshold (0 disables; see RFTracerConfig)
    g.add_argument('--term-tau', type=float, default=0.0)
    # lean stage-1 march (deferred fine mode; see RFTracerConfig)
    g.add_argument('--lean-stage1', type=_bool, default=False)
    # two-level super-segment cull (lean only; dilation auto-derived)
    g.add_argument('--super-factor', type=int, default=0)

    g = parser.add_argument_group('net')  # nerf nef extras
    g.add_argument('--view-embedder', type=str, default='positional')
    g.add_argument('--view-multires', type=int, default=4)

    g = parser.add_argument_group('dataset_nerf')
    g.add_argument('--multiview-dataset-format', type=str, default='standard')
    # accepted for reference-YAML compatibility; unused (no torch DataLoader
    # here — batches are presampled host-side into scan inputs)
    g.add_argument('--dataset-num-workers', type=int, default=-1)
    g.add_argument('--mip', type=int, default=0)
    g.add_argument('--num-rays-sampled-per-img', type=int, default=4096)
    g.add_argument('--dataset-split', type=str, default='train')
    g.add_argument('--max-views', type=int, default=None)

    g = parser.add_argument_group('trainer_nerf')
    g.add_argument('--prune-every', type=int, default=-1)
    g.add_argument('--random-lod', type=_bool, default=False)
    # adaptive post-prune compaction budget (TPU-native; MultiviewTrainer)
    g.add_argument('--adaptive-budget', type=_bool, default=False)
    g.add_argument('--budget-headroom', type=float, default=1.5)
    g.add_argument('--min-budget', type=int, default=16384)

    g = parser.add_argument_group('renderer')
    g.add_argument('--render-batch', type=int, default=4096)
    g.add_argument('--render-res', type=int, nargs=2, default=[1024, 1024])
    g.add_argument('--camera-origin', type=float, nargs=3, default=[-3.0, 0.65, -3.0])
    # composite debug data layers (occupancy wireframe + axes gizmo) over the
    # turntable frames (ref active-data-layer painting, wisp_app.py:451)
    g.add_argument('--overlay-layers', type=_bool, default=False)
    # 360-degree turntable breadth (ref render_final_view sweeps pi*0.1
    # increments over num_angles+1 frames, multiview_trainer.py:237-245;
    # 20 -> a full revolution).  0 res = dataset resolution.
    g.add_argument('--num-angles', type=int, default=20)
    g.add_argument('--turntable-res', type=int, default=0)
    return parser


def _bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ('1', 'true', 'yes', 'on')


def parse_yaml_config(config_path: str, parser: argparse.ArgumentParser):
    """Set parser defaults from a YAML file (1-level ``parent:`` inheritance).

    Mirrors config_parser.parse_yaml_config (reference :155-211): sections are
    argument-group names (not nested namespaces), unknown fields raise.
    """
    with open(config_path) as f:
        config_dict = yaml.safe_load(f) or {}

    valid = set()
    for group in parser._action_groups:
        for a in group._group_actions:
            valid.add(a.dest)

    defaults = {}
    parent = config_dict.pop('parent', None)
    if parent is not None:
        if not os.path.isabs(parent):
            parent = os.path.join(os.path.dirname(config_path), parent)
        with open(parent) as f:
            parent_dict = yaml.safe_load(f) or {}
        if 'parent' in parent_dict:
            raise ValueError('Hierarchical configs deeper than 1 level are not allowed.')
        for section in parent_dict.values():
            for field, value in (section or {}).items():
                if field not in valid:
                    raise ValueError(f'{field} is not a valid option (typo in config?)')
                defaults[field] = value
    for section in config_dict.values():
        for field, value in (section or {}).items():
            if field not in valid:
                raise ValueError(f'{field} is not a valid option (typo in config?)')
            defaults[field] = value
    parser.set_defaults(**defaults)
    return defaults


def parse_args(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """CLI > YAML > defaults (reference parse_args, :214-246)."""
    args = parser.parse_args(argv)
    if args.config is not None:
        parse_yaml_config(args.config, parser)
        args = parser.parse_args(argv)
    apply_platform(args)
    return args


def apply_platform(args) -> None:
    """Honor ``--platform`` before any jax array is created.

    ``jax.config.update`` is required (not the JAX_PLATFORMS env var): some
    environments force-register remote accelerator plugins that ignore the
    env var.
    """
    if getattr(args, 'platform', None):
        import jax
        jax.config.update('jax_platforms', args.platform)


# ---------------------------------------------------------------------------
# Builders: argparse namespace -> framework config dataclasses
# ---------------------------------------------------------------------------

def build_grid_config(args, resolution_dim: int):
    """Grid config from parsed args — dispatches ``--grid-type`` to the
    backbone family like the reference (main_nerf.py:371-505):
    LatentGrid (SHACIRA), HashGrid (INGP, = LatentGrid with no latent
    decoder), OctreeGrid (NGLOD), CodebookOctreeGrid (VQAD),
    TriplanarGrid.  Octree/codebook structure (host-built, possibly from
    the dataset pointcloud) is created by the trainer."""
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    grid_type = getattr(args, 'grid_type', 'LatentGrid')
    if grid_type in ('OctreeGrid', 'CodebookOctreeGrid', 'TriplanarGrid'):
        if resolution_dim != 3:
            raise ValueError(f'{grid_type} is 3D-only (NeRF/SDF apps)')
        base = dict(feature_dim=args.feature_dim, base_lod=args.base_lod,
                    num_lods=args.num_lods,
                    multiscale_type=args.multiscale_type,
                    feature_std=args.feature_std,
                    feature_bias=args.feature_bias)
        if grid_type == 'OctreeGrid':
            from shacira_tpu.models.grids.octree_grid import OctreeGridConfig
            return OctreeGridConfig(**base)
        if grid_type == 'CodebookOctreeGrid':
            from shacira_tpu.models.grids.octree_grid import (
                CodebookOctreeGridConfig)
            return CodebookOctreeGridConfig(
                codebook_bitwidth=args.codebook_bitwidth, **base)
        from shacira_tpu.models.grids.triplanar_grid import TriplanarGridConfig
        return TriplanarGridConfig(**base)
    if grid_type not in ('LatentGrid', 'HashGrid'):
        raise ValueError(f'Unknown grid_type: {grid_type}')
    common = dict(
        feature_dim=args.feature_dim,
        # HashGrid stores features directly (no latent indirection)
        latent_dim=0 if grid_type == 'HashGrid' else args.latent_dim,
        multiscale_type=args.multiscale_type,
        resolution_dim=resolution_dim,
        feature_std=args.feature_std,
        feature_bias=args.feature_bias,
        codebook_bitwidth=args.codebook_bitwidth,
        init_grid=args.init_grid,
        hash_layout=getattr(args, 'hash_layout', 'xor'),
        page_res=getattr(args, 'page_res', 16),
        num_prob_layers=args.num_prob_layers,
        noise_freq=args.noise_freq,
        entropy_enabled=args.ldecode_enabled and (
            args.entropy_reg > 0 or args.entropy_reg_end > 0),
    )
    if args.tree_type == 'geometric':
        cfg = LatentGridConfig.from_geometric(
            num_lods=args.num_lods, min_grid_res=args.min_grid_res,
            max_grid_res=args.max_grid_res, **common)
    else:
        cfg = LatentGridConfig.from_octree(
            base_lod=args.base_lod, num_lods=args.num_lods, **common)
    # 'HashGrid' = uncompressed INGP grid: same layout, no latent decoder
    # regardless of the latent_decoder section (ref main_nerf.py:443-469)
    if args.ldecode_enabled and grid_type != 'HashGrid':
        cfg = cfg.with_ldec(dict(
            norm=args.norm,
            ldecode_matrix=args.ldecode_matrix,
            use_shift=args.use_shift,
            num_layers_dec=args.num_layers_dec,
            hidden_dim_dec=args.hidden_dim_dec,
            activation=args.activation_dec,
            clamp_weights=args.clamp_weights,
            ldec_std=args.ldec_std,
            use_sga=args.use_sga,
            diff_sampling=args.diff_sampling,
        ))
    return cfg


def build_image_trainer_config(args):
    from shacira_tpu.trainers.image_trainer import ImageTrainerConfig
    return ImageTrainerConfig(
        epochs=args.epochs, rgb_loss_weight=args.rgb_loss,
        optimizer_type=args.optimizer_type, lr=args.lr, grid_lr=args.grid_lr,
        ldec_lr=args.ldec_lr, scale_grid_lr=args.scale_grid_lr,
        weight_decay=args.weight_decay,
        weight_decay_decoder=args.weight_decay_decoder,
        ldec_lr_warmup=args.ldec_lr_warmup,
        use_sga=args.use_sga and args.ldecode_enabled,
        decay_period=args.decay_period, temperature=args.temperature,
        norm=args.norm, norm_every=args.norm_every,
        entropy_reg=args.entropy_reg, entropy_reg_end=args.entropy_reg_end,
        entropy_reg_sched=args.entropy_reg_sched, noise_freq=args.noise_freq,
        rng_impl=args.rng_impl,
        resample=args.resample, resample_every=args.resample_every,
        chunk_size=args.chunk_size, log_every=args.log_every,
        valid_every=args.valid_every, save_every=args.save_every,
        render_tb_every=args.render_tb_every)


def build_image_model_config(args):
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    return NeuralImageConfig(
        grid=build_grid_config(args, resolution_dim=2),
        hidden_dim=args.hidden_dim, num_layers=args.num_layers,
        activation=args.activation_type,
        final_activation=args.final_activation,
        pos_embedder=args.pos_embedder, pos_multires=args.pos_multires,
        position_input=args.position_input)


def build_nerf_model_config(args):
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    return NeuralRadianceFieldConfig(
        grid=build_grid_config(args, resolution_dim=3),
        hidden_dim=args.hidden_dim, num_layers=args.num_layers,
        activation=args.activation_type,
        pos_embedder=args.pos_embedder, view_embedder=args.view_embedder,
        pos_multires=args.pos_multires, view_multires=args.view_multires,
        position_input=args.position_input,
        prune_density_decay=args.prune_density_decay,
        prune_min_density=args.prune_min_density,
        blas_level=int(args.blas_level),
        amp=not args.disable_amp)


def build_nerf_trainer_config(args):
    from shacira_tpu.trainers.multiview_trainer import MultiviewTrainerConfig
    return MultiviewTrainerConfig(
        epochs=args.epochs, rgb_loss_weight=args.rgb_loss,
        optimizer_type=args.optimizer_type, lr=args.lr, grid_lr=args.grid_lr,
        ldec_lr=args.ldec_lr, scale_grid_lr=args.scale_grid_lr,
        weight_decay=args.weight_decay,
        weight_decay_decoder=args.weight_decay_decoder,
        ldec_lr_warmup=args.ldec_lr_warmup,
        use_sga=args.use_sga and args.ldecode_enabled,
        decay_period=args.decay_period, temperature=args.temperature,
        entropy_reg=args.entropy_reg, entropy_reg_end=args.entropy_reg_end,
        entropy_reg_sched=args.entropy_reg_sched, noise_freq=args.noise_freq,
        rng_impl=args.rng_impl,
        prune_every=args.prune_every, random_lod=args.random_lod,
        adaptive_budget=args.adaptive_budget,
        budget_headroom=args.budget_headroom, min_budget=args.min_budget,
        chunk_size=args.chunk_size, log_every=args.log_every,
        valid_every=args.valid_every, save_every=args.save_every,
        render_tb_every=args.render_tb_every)


def build_tracer_config(args):
    from shacira_tpu.tracers.rf_tracer import RFTracerConfig
    return RFTracerConfig(
        raymarch_type=args.raymarch_type, num_steps=args.num_steps,
        bg_color=args.bg_color, max_intersections=args.max_intersections,
        max_samples=args.max_samples, segment_size=args.segment_size,
        seg_budget=args.seg_budget, coarse_level=args.coarse_level,
        seg_dilation=args.seg_dilation,
        eval_seg_budget=args.eval_seg_budget,
        group_segs_per_block=args.group_segs_per_block,
        fine_mode=args.fine_mode,
        term_tau=getattr(args, 'term_tau', 0.0),
        lean_stage1=getattr(args, 'lean_stage1', False),
        super_factor=getattr(args, 'super_factor', 0),
        group_seg_size=getattr(args, 'group_seg_size', 0),
        group_res=getattr(args, 'page_res', 16) // 2)
