"""Steady-state wall attribution of the pruned lego-config NeRF step.

The r3 ROOFLINE table attributes the DENSE step (262144/24576 budgets);
the sustained headline runs at the settled adaptive budgets (~98304/16384
on the lego-class scene) where fixed costs (stage-1 cull over [R, ns],
codebook-wide streams) weigh far more.  This probe warms through the prune
cycle, then times each phase at the SETTLED tracer config and the real
occupancy state, and histograms the per-live-segment cached density (the
signal an occupancy-aware sample-allocation step would key on).

Run: python tools/probe_steady.py [--warmup N] [--out FILE]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))


def sync(x):
    import jax
    leaf = [l for l in jax.tree.leaves(x) if hasattr(l, 'shape')][0]
    np.asarray(leaf.reshape(-1)[0:1])


def timeit(f, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import bench_nerf
    from shacira_tpu.core.rays import make_rays
    from shacira_tpu.models.grids import latent_grid as lg
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs import nerf as nerf_mod
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.ops import paged_hash as ph
    from shacira_tpu.accel import occupancy as occ_mod
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.tracers.rf_tracer import _stride_compact
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    warm = 1200
    if '--warmup' in sys.argv:
        warm = int(sys.argv[sys.argv.index('--warmup') + 1])
    meas = 100
    if '--iters' in sys.argv:
        meas = int(sys.argv[sys.argv.index('--iters') + 1])
    if '--cpu' in sys.argv:   # smoke mode: shape/compile check off-TPU
        jax.config.update('jax_platforms', 'cpu')

    data = bench_nerf.lego_like_scene()
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
    tcfg0 = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=2048, bg_color='white',
        max_samples=262144, segment_size=16, coarse_level=7, seg_dilation=2,
        seg_budget=32768, eval_seg_budget=24576, group_segs_per_block=8,
        fine_mode='deferred', term_tau=11.5)
    cfg = MultiviewTrainerConfig(epochs=300, prune_every=100, chunk_size=50,
                                 rng_impl='unsafe_rbg', use_sga=True,
                                 temperature=1.0, entropy_reg=1e-4,
                                 entropy_reg_end=1e-4, adaptive_budget=True,
                                 min_budget=8192)
    tr = MultiviewTrainer(cfg, mcfg, tcfg0, data, num_rays=4096, seed=0)
    print(f'warming {warm} iters...', flush=True)
    tr.train(num_iterations=warm)
    sync(tr.params)

    tcfg = tr.active_tracer_cfg
    report = {
        'warmup_iters': warm,
        'settled_max_samples': tcfg.max_samples,
        'settled_seg_budget': tcfg.seg_budget,
        'settled_eval_seg_budget': tcfg.eval_seg_budget,
        'occupancy_frac': float(np.asarray(
            jnp.mean(tr.occ_state['occ'].astype(jnp.float32))[None])[0]),
    }
    print(json.dumps(report), flush=True)

    t0 = time.time()
    tr.train(num_iterations=meas)
    sync(tr.params)
    step_s = (time.time() - t0) / meas
    report['full_step_ms'] = step_s * 1e3
    report['rays_per_s'] = 4096 / step_s

    key = jax.random.PRNGKey(7)
    ro = jnp.asarray(data.rays_o[0, :4096])
    rd = jnp.asarray(data.rays_d[0, :4096])
    rays = make_rays(ro, rd, data.dist_min, data.dist_max)
    gt = jnp.asarray(data.rgb[0, :4096])
    G = tcfg.segment_size
    ns = tcfg.num_steps // G
    K2 = tcfg.eval_seg_budget
    N = tcfg.max_samples

    # ---- full loss fwd / fwd+bwd at settled shapes -----------------------
    def loss_fn(p, occ_state, k):
        parts = lg.affine_parts(p['grid'], grid, use_sga=True,
                                temperature=1.0, rng=k)

        def field_fn(c, d):
            return nerf_mod.nerf_rgba(p, mcfg, c, d, affine=parts)

        def zbar_fn(c, grouping):
            return nerf_mod.nerf_zbar(p, mcfg, c, grouping, G, affine=parts)

        def finish_fn(zb, c):
            return nerf_mod.nerf_finish_feats(p, mcfg, zb, c, affine=parts)

        def head_fn(f, d):
            return nerf_mod.nerf_head(p, mcfg, f, d)

        rb = rf_tracer.trace(field_fn, occ_state, mcfg.occ_cfg, tcfg, rays,
                             k, encode_split=(zbar_fn, finish_fn, head_fn))
        return jnp.mean(jnp.abs(rb['rgb'] - gt))

    report['loss_fwd_only_ms'] = timeit(
        jax.jit(loss_fn), tr.params, tr.occ_state, key) * 1e3
    report['loss_fwd_bwd_ms'] = timeit(
        jax.jit(jax.value_and_grad(loss_fn)), tr.params, tr.occ_state,
        key) * 1e3

    # ---- march + compaction + integration, trivial field -----------------
    def trivial_field(c, d):
        s = jnp.sum(c * d, -1, keepdims=True)
        return jnp.concatenate([s, s, s], -1), jax.nn.relu(s)

    import dataclasses
    tcfg_nopaged = dataclasses.replace(tcfg, eval_seg_budget=0)
    report['march_trivial_fwd_ms'] = timeit(
        jax.jit(lambda o, k: rf_tracer.trace(
            trivial_field, o, mcfg.occ_cfg, tcfg_nopaged, rays, k)),
        tr.occ_state, key) * 1e3

    # stage-1 cull alone (jitter + midpoints + packed coarse gather + term)
    s1 = jax.jit(lambda o, k: rf_tracer.coarse_segment_live(
        o, mcfg.occ_cfg, tcfg, rays, k))
    report['stage1_cull_ms'] = timeit(s1, tr.occ_state, key) * 1e3

    # stage-1 compaction at [R*ns] -> seg_budget
    mask = jax.random.bernoulli(key, 0.05, (4096 * ns,))
    report['stage1_compact_ms'] = timeit(
        jax.jit(lambda m: _stride_compact(m, tcfg.seg_budget or K2)),
        mask) * 1e3
    # row compaction at [K2*G] -> N
    mask2 = jax.random.bernoulli(key, 0.4, (K2 * G,))
    report['row_compact_ms'] = timeit(
        jax.jit(lambda m: _stride_compact(m, N)), mask2) * 1e3

    # fine query at the settled eval rows
    qpts = jax.random.uniform(key, (K2, G, 3), minval=-1, maxval=1)
    report['fine_query_ms'] = timeit(
        jax.jit(lambda s, p: occ_mod.query(s, mcfg.occ_cfg, p)),
        tr.occ_state, qpts) * 1e3

    # grouping at K2 keys
    centers = jax.random.uniform(key, (K2, 3))
    live = jnp.ones((K2,), bool)
    gr = ph.group_res_of(grid.spec.page_res)
    n_blocks = K2 // tcfg.group_segs_per_block + gr ** 3
    report['grouping_ms'] = timeit(
        jax.jit(lambda c, l: ph.group_segments(
            c, l, tcfg.group_segs_per_block, n_blocks, gr)),
        centers, live) * 1e3

    # paged encode at the settled slot shapes
    grouping = jax.jit(lambda c, l: ph.group_segments(
        c, l, tcfg.group_segs_per_block, n_blocks, gr))(centers, live)
    spec = grid.spec
    static = ph.default_static(spec, include_direct=True)
    nslots = n_blocks * tcfg.group_segs_per_block * G
    coords_s = jax.random.uniform(key, (nslots, 3), minval=-0.9, maxval=0.9)
    slot_valid = jnp.ones((nslots,), bool)
    z = jax.random.normal(key, (spec.total_size, 1))
    bc = grouping['block_cell']
    report['paged_encode_fwd_ms'] = timeit(
        jax.jit(lambda cs, zz: ph.paged_interp_lods(
            cs, slot_valid, bc, grouping['cell_used'], zz, None, static)),
        coords_s, z) * 1e3
    report['paged_encode_fwd_bwd_ms'] = timeit(
        jax.jit(jax.value_and_grad(lambda zz: jnp.sum(ph.paged_interp_lods(
            coords_s, slot_valid, bc, grouping['cell_used'], zz, None,
            static)))), z) * 1e3
    report['paged_slot_rows'] = int(nslots)

    # codebook-wide work at lego table size
    noise = jax.random.uniform(key, (spec.total_size, 1)) - 0.5

    def parts_loss(p, k):
        zz, mat, sh = lg.affine_parts(p['grid'], grid, use_sga=True,
                                      temperature=1.0, rng=k)
        return jnp.sum(zz) + jnp.sum(mat) + jnp.sum(sh)

    report['affine_parts_fwd_bwd_ms'] = timeit(
        jax.jit(jax.value_and_grad(parts_loss)), tr.params, key) * 1e3
    report['ent_loss_fwd_bwd_ms'] = timeit(
        jax.jit(jax.value_and_grad(
            lambda p: lg.ent_loss(p['grid'], grid, noise)[0])),
        tr.params) * 1e3

    # ---- the importance-sampling signal ---------------------------------
    # per live stage-2 segment: dilated max cached density around its
    # midpoint, estimated segment tau (dens * chord), and the fine-live
    # sample count.  If most eval rows sit in low-tau segments, density-
    # aware sample allocation has room; if the mass is at high tau, not.
    res = mcfg.occ_cfg.res
    d = tr.occ_state['density']
    d_dil = jax.lax.reduce_window(d, -jnp.inf, jax.lax.max, (3, 3, 3),
                                  (1, 1, 1), 'SAME')

    def seg_stats(occ_state, k):
        depth, deltas, mask_c = rf_tracer.coarse_segment_live(
            occ_state, mcfg.occ_cfg, tcfg, rays, k)
        R = 4096
        src2, valid2, _ = _stride_compact(mask_c.reshape(-1), K2)
        r_id = src2 // ns
        dep = jnp.take(depth.reshape(R * ns, G), src2, axis=0)
        o2 = jnp.take(rays.origins, r_id, axis=0)
        dd2 = jnp.take(rays.dirs, r_id, axis=0)
        smp = o2[:, None, :] + dd2[:, None, :] * dep[..., None]
        fine = occ_mod.query(occ_state, mcfg.occ_cfg, smp) & valid2[:, None]
        mid = smp[:, G // 2, :]
        ci = jnp.clip(jnp.floor((mid * 0.5 + 0.5) * res), 0,
                      res - 1).astype(jnp.int32)
        dens = d_dil[ci[..., 0], ci[..., 1], ci[..., 2]]
        chord = dep[:, -1] - dep[:, 0]
        return dens, dens * chord, fine.sum(-1), valid2

    dens, tau, fine_cnt, valid2 = jax.jit(seg_stats)(tr.occ_state, key)
    dens = np.asarray(dens)[np.asarray(valid2)]
    tau = np.asarray(tau)[np.asarray(valid2)]
    fine_cnt = np.asarray(fine_cnt)[np.asarray(valid2)]
    qs = [0, 10, 25, 50, 75, 90, 100]
    report['live_segments'] = int(dens.shape[0])
    report['seg_dens_dil_pct'] = {str(q): float(np.percentile(dens, q))
                                  for q in qs}
    report['seg_tau_est_pct'] = {str(q): float(np.percentile(tau, q))
                                 for q in qs}
    report['seg_fine_live_rows_pct'] = {str(q): float(np.percentile(
        fine_cnt, q)) for q in qs}
    report['fine_live_row_frac'] = float(fine_cnt.sum() / (dens.shape[0] * G))
    # fraction of FINE-LIVE rows sitting in segments below tau thresholds
    for thr in (0.05, 0.1, 0.25, 0.5, 1.0):
        sel = tau < thr
        report[f'fine_rows_below_tau_{thr}'] = float(
            fine_cnt[sel].sum() / max(fine_cnt.sum(), 1))

    out_path = '/tmp/probe_steady.json'
    if '--out' in sys.argv:
        out_path = sys.argv[sys.argv.index('--out') + 1]
    with open(out_path, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == '__main__':
    main()
