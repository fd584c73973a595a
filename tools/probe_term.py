"""Probe: live-segment fraction vs term_tau on the bench lego-shaped scene.

Transmittance culling only pays off when the adaptive budgets drop a pow2
rung (static shapes shrink); this prints the stage-1 coarse-live fraction
and the post-term live fraction at several thresholds, after the same
300-iteration warmup measure_pruned uses, so we can see how much the
budgets *could* shrink and pick a threshold.

Usage: python tools/probe_term.py [--warmiters 300]
"""
import dataclasses
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))


def main():
    import numpy as np
    warm = 300
    if '--warmiters' in sys.argv:
        warm = int(sys.argv[sys.argv.index('--warmiters') + 1])

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
        num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
        page_res=16,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=128, num_layers=1,
                                     view_embedder='positional',
                                     view_multires=4, blas_level=7, amp=True)
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=2048,
                                    bg_color='white', max_samples=262144,
                                    segment_size=16, coarse_level=7,
                                    seg_dilation=2, seg_budget=32768,
                                    eval_seg_budget=24576,
                                    group_seg_size=0, group_segs_per_block=8,
                                    fine_mode='deferred')
    cfg = MultiviewTrainerConfig(epochs=300, prune_every=100, chunk_size=50,
                                 rng_impl='unsafe_rbg', use_sga=True,
                                 temperature=1.0, entropy_reg=1e-4,
                                 entropy_reg_end=1e-4,
                                 adaptive_budget=True, min_budget=8192)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=4096, seed=0)
    tr.train(num_iterations=warm)
    np.asarray(tr.params['grid']['codebook'][0:1])

    dens = np.asarray(tr.occ_state['density'])
    occ_np = np.asarray(tr.occ_state['occ'])
    out = {'warmiters': warm,
           'occ_frac': float(occ_np.mean()),
           'density_p50_occ': float(np.median(dens[occ_np])) if occ_np.any() else 0.0,
           'density_p90_occ': float(np.percentile(dens[occ_np], 90)) if occ_np.any() else 0.0,
           'density_max': float(dens.max()),
           'fractions': {}}
    for tt in (0.0, 11.5, 9.0, 6.0, 3.0):
        tr.tracer_cfg = dataclasses.replace(tcfg, term_tau=tt)
        tr._fns.pop('probe_seg', None)
        tr._refresh_coarse()
        out['fractions'][str(tt)] = round(tr._live_segment_fraction(), 5)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
