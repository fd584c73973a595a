"""NeRF training throughput benchmark (rays/s) — lego-shaped config.

Secondary benchmark (the driver runs bench.py; this script instruments the
NeRF path): trains the nerf_lego LatentGrid configuration on a synthetic
multiview scene and reports rays/s on the available accelerator.
Usage: python bench_nerf.py [--iters N]
"""
import json
import sys
import time

import numpy as np


# A100 Wisp-reference estimate (the reference publishes no numbers,
# BASELINE.md): wisp trains lego 300 epochs x 100 views = 30K iterations of
# 4096 rays; on an A100 the torch+CUDA stack plausibly sustains ~20 iter/s
# with SHACIRA's latent-decode/entropy overhead (~25 min total) ->
# ~80K rays/s.  The >=3x north star is therefore ~245K rays/s/chip.
A100_REF_RAYS_S = 80000.0
NORTH_STAR_RAYS_S = 3.0 * A100_REF_RAYS_S   # >=3x A100 (BASELINE.md)


def lego_like_scene(views: int = 40, res: int = 128):
    """The benchmark scene for SUSTAINED measurements: the same composite
    SDF object `tools/make_synthetic_data.py nerf` renders for the
    committed end-to-end lego runs.  A lego-class scene prunes to ~0.2-1%
    occupancy, which is the regime the adaptive budgets + transmittance
    culling operate in on the real workload; the solid analytic sphere
    (`tests/test_nerf.synthetic_scene`) stays ~7% occupied and pins every
    budget at its cap, under-reporting steady state by ~40%."""
    import os
    import sys as _sys
    cache = f'/tmp/bench_scene_v{views}_r{res}'
    if not os.path.isdir(cache):
        _sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), 'tools'))
        from make_synthetic_data import write_nerf_scene
        import contextlib
        with contextlib.redirect_stdout(_sys.stderr):
            write_nerf_scene(cache, views=views, val_views=1, res=res)
    from shacira_tpu.datasets.nerf_synthetic import load_nerf_synthetic
    return load_nerf_synthetic(cache, split='train', mip=0)


def measure(paged: bool = True, iters: int = 30, coarse_level: int = 5,
            seg_dilation: int = 1, seg_budget: int = 0,
            num_rays: int = 4096, fine_mode: str = 'deferred',
            lean_stage1: bool = False):
    import jax
    sys.path.insert(0, 'tests')
    from test_nerf import synthetic_scene
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)


    data = synthetic_scene(num_views=20, res=64)
    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=24, min_grid_res=16, max_grid_res=512,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=19, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
        hash_layout='paged' if paged else 'xor',
        page_res=16,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=128, num_layers=1,
                                     view_embedder='positional',
                                     view_multires=4, blas_level=7,
                                     amp=True)
    r = num_rays // 4096                              # budget scale factor
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=2048,
                                    bg_color='white',
                                    max_samples=262144 * r,
                                    segment_size=16, coarse_level=coarse_level,
                                    seg_dilation=seg_dilation,
                                    seg_budget=seg_budget * r,
                                    eval_seg_budget=24576 * r if paged else 0,
                                    group_seg_size=0, group_segs_per_block=8,
                                    fine_mode=fine_mode if paged else 'exact',
                                    lean_stage1=lean_stage1)
    cfg = MultiviewTrainerConfig(epochs=300, prune_every=-1, chunk_size=10,
                                 rng_impl='unsafe_rbg',
                                 use_sga=True, temperature=1.0,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=num_rays, seed=0)

    tr.train(num_iterations=10)                       # warmup + compile
    np.asarray(tr.params['grid']['codebook'][0:1])
    t0 = time.time()
    tr.train(num_iterations=iters)
    np.asarray(tr.params['grid']['codebook'][0:1])
    dt = time.time() - t0
    rays_s = num_rays * iters / dt
    return {
        'metric': 'nerf_train_rays_per_s',
        'value': round(rays_s, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_s / A100_REF_RAYS_S, 3),
        'config': f'lego-shaped: 24 LODs bw19 F4, ray-march 2048 steps, '
                  f'{num_rays} rays/iter, {262144 * r}-sample budget, '
                  '16-sample segment culling'
                  + (f', paged encode ({24576 * r}-segment eval budget)'
                     if paged else '')
                  + (', lean stage-1' if lean_stage1 else ''),
    }


def measure_pruned(iters: int = 200, coarse_level: int = 7,
                   seg_dilation: int = 2, seg_budget: int = 32768,
                   fine_mode: str = 'deferred', term_tau: float = 0.0,
                   group_seg_size: int = 0, lean_stage1: bool = False,
                   segment_size: int = 16, super_factor: int = 0,
                   segs_per_block: int = 0):
    """Sustained rays/s on the reference's ACTUAL lego workload: pruning
    every 100 iterations (nerf_lego.yaml) with adaptive sample/segment
    budgets.  After the occupancy grid settles (~7% cells), every stage
    downstream of the coarse cull shrinks with the live-segment count, so
    steady-state throughput is well above the dense (unpruned) number."""
    import jax
    sys.path.insert(0, 'tests')
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)
    import numpy as np

    data = lego_like_scene()
    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=24, min_grid_res=16, max_grid_res=512,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=19, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
        page_res=16,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=128, num_layers=1,
                                     view_embedder='positional',
                                     view_multires=4, blas_level=7,
                                     amp=True)
    # culling segments of ``segment_size`` samples; eval/segment budgets
    # scale so the ROW budgets stay constant across segment sizes.  At
    # segment_size 32 the grouped sub-segment stays 16 samples (the paged
    # cover bound is on the SUB-segment).
    if segment_size > 16 and not group_seg_size:
        group_seg_size = 16
    seg_scale = segment_size // 16
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=2048,
                                    bg_color='white', max_samples=262144,
                                    segment_size=segment_size,
                                    coarse_level=coarse_level,
                                    seg_dilation=seg_dilation,
                                    seg_budget=seg_budget // seg_scale,
                                    eval_seg_budget=24576 // seg_scale,
                                    group_seg_size=group_seg_size,
                                    # kernel blocks must stay >=128 rows
                                    # (Mosaic lane reshape limit)
                                    group_segs_per_block=(
                                        segs_per_block or (
                                            max(8, 128 // group_seg_size)
                                            if group_seg_size else 8)),
                                    fine_mode=fine_mode, term_tau=term_tau,
                                    lean_stage1=lean_stage1,
                                    super_factor=super_factor)
    cfg = MultiviewTrainerConfig(epochs=300, prune_every=100, chunk_size=50,
                                 rng_impl='unsafe_rbg',
                                 use_sga=True, temperature=1.0,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4,
                                 adaptive_budget=True, min_budget=8192)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=4096, seed=0)

    # 1500 warmup iterations: the prune cycle fires repeatedly, densities
    # grow toward their converged profile, and the adaptive budgets walk
    # down their rungs (recompiles included in warmup, excluded from the
    # measured window).  The real lego workload runs 30K iterations, so
    # steady state — not the iteration-300 transient — is what "sustained"
    # should measure: the r4 lego run logs ~100K rays/s at iteration 10K
    # while the 300-iter transient measures ~60K.
    tr.train(num_iterations=1500)
    np.asarray(tr.params['grid']['codebook'][0:1])
    t0 = time.time()
    tr.train(num_iterations=iters)
    np.asarray(tr.params['grid']['codebook'][0:1])
    dt = time.time() - t0
    rays_s = 4096 * iters / dt
    return {
        'metric': 'nerf_train_rays_per_s_pruned_sustained',
        'value': round(rays_s, 1),
        'unit': 'rays/s',
        # vs_baseline compares against the A100 reference ITSELF; the
        # north star is 3x that (vs_target below) — do not read 0.7 as
        # '70% of target'
        'vs_baseline': round(rays_s / A100_REF_RAYS_S, 3),
        'vs_target_3x': round(rays_s / NORTH_STAR_RAYS_S, 3),
        'target_rays_per_s': NORTH_STAR_RAYS_S,
        'sample_budget': tr.active_tracer_cfg.max_samples,
        'eval_seg_budget': tr.active_tracer_cfg.eval_seg_budget,
        'config': 'lego workload: 24 LODs bw19 F4, ray-march 2048 steps, '
                  '4096 rays/iter, prune/100 + adaptive budgets, paged '
                  f'encode, {fine_mode} fine mode'
                  + (f', term_tau={term_tau}' if term_tau > 0 else '')
                  + (', lean stage-1' if lean_stage1 else '')
                  + (f', super_factor={super_factor}' if super_factor > 1
                     else '')
                  + (f', segment_size={segment_size}'
                     if segment_size != 16 else ''),
    }


def measure_voxel(paged: bool = True, iters: int = 200,
                  term_tau: float = 0.0):
    """V8-shaped 'voxel' DDA-marching SUSTAINED throughput (RTMV config:
    20 LODs bw17 latent_dim 2 F4, 16 steps/cell, blas 7, prune/100 like the
    reference nerf_V8.yaml:73) with adaptive budgets.  With ``paged``, each
    intersected cell's sample group rides the block-local encode kernels;
    ``term_tau`` adds transmittance culling of occluded cells."""
    import jax
    sys.path.insert(0, 'tests')
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    data = lego_like_scene()
    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=20, min_grid_res=16, max_grid_res=512,
        latent_dim=2, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=17, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
        hash_layout='paged' if paged else 'xor',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=128, num_layers=1,
                                     view_embedder='positional',
                                     view_multires=4, blas_level=7,
                                     amp=True)
    tcfg = rf_tracer.RFTracerConfig(
        raymarch_type='voxel', num_steps=16, bg_color='white',
        max_intersections=64, max_samples=262144,
        eval_seg_budget=16384 if paged else 0, term_tau=term_tau)
    cfg = MultiviewTrainerConfig(epochs=600, prune_every=100, chunk_size=50,
                                 rng_impl='unsafe_rbg',
                                 use_sga=True, temperature=1.0,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4,
                                 adaptive_budget=True, min_budget=8192)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=4096, seed=0)
    # 1000 warmup iterations: prune fires repeatedly, densities approach
    # their converged profile and budgets settle (recompiles included in
    # warmup, excluded from the measured window; see measure_pruned)
    tr.train(num_iterations=1000)
    np.asarray(tr.params['grid']['codebook'][0:1])
    t0 = time.time()
    tr.train(num_iterations=iters)
    np.asarray(tr.params['grid']['codebook'][0:1])
    dt = time.time() - t0
    rays_s = 4096 * iters / dt
    return {
        'metric': 'nerf_voxel_train_rays_per_s_pruned_sustained',
        'value': round(rays_s, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_s / A100_REF_RAYS_S, 3),
        'sample_budget': tr.active_tracer_cfg.max_samples,
        'eval_seg_budget': tr.active_tracer_cfg.eval_seg_budget,
        'config': 'V8-shaped: 20 LODs bw17 F4 latent2, voxel-march 16 '
                  'steps/cell, 4096 rays/iter, prune/100 + adaptive budgets'
                  + (', paged encode' if paged else '')
                  + (f', term_tau={term_tau}' if term_tau > 0 else ''),
    }


def main():
    iters = 30
    fine_mode = 'deferred'
    if '--iters' in sys.argv:
        iters = int(sys.argv[sys.argv.index('--iters') + 1])
    if '--fine-mode' in sys.argv:
        fine_mode = sys.argv[sys.argv.index('--fine-mode') + 1]
    term_tau = 0.0
    if '--term-tau' in sys.argv:
        term_tau = float(sys.argv[sys.argv.index('--term-tau') + 1])
    gss = 0
    if '--gss' in sys.argv:
        gss = int(sys.argv[sys.argv.index('--gss') + 1])
    lean = '--lean' in sys.argv
    segsz = 16
    if '--seg-size' in sys.argv:
        segsz = int(sys.argv[sys.argv.index('--seg-size') + 1])
    superf = 0
    if '--super' in sys.argv:
        superf = int(sys.argv[sys.argv.index('--super') + 1])
    spb = 0
    if '--spb' in sys.argv:
        spb = int(sys.argv[sys.argv.index('--spb') + 1])
    if '--pruned' in sys.argv:
        print(json.dumps(measure_pruned(iters=max(iters, 200),
                                        fine_mode=fine_mode,
                                        term_tau=term_tau,
                                        group_seg_size=gss,
                                        lean_stage1=lean or superf > 1,
                                        segment_size=segsz,
                                        super_factor=superf,
                                        segs_per_block=spb)))
        return
    if '--voxel' in sys.argv:
        print(json.dumps(measure_voxel(paged='--paged' in sys.argv,
                                       iters=max(iters, 200),
                                       term_tau=term_tau)))
        return
    paged = '--paged' in sys.argv
    print(json.dumps(measure(paged=paged, iters=iters,
                             fine_mode=fine_mode, lean_stage1=lean)))


if __name__ == '__main__':
    main()
