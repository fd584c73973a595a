"""NeRF slice: occupancy grid, raymarching, volume integration, end-to-end
convergence on a synthetic multiview scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shacira_tpu.core.rays import make_rays
from shacira_tpu.accel import occupancy as occ
from shacira_tpu.tracers import rf_tracer
from shacira_tpu.datasets.nerf_synthetic import MultiviewData, pinhole_rays


def test_occupancy_query_inside_outside():
    cfg = occ.OccupancyGridConfig(level=3)
    state = occ.occupancy_init(cfg)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [-1.5, 0.0, 0.0]])
    q = occ.query(state, cfg, pts)
    assert bool(q[0]) and not bool(q[1]) and not bool(q[2])


def test_occupancy_prune_update():
    cfg = occ.OccupancyGridConfig(level=2)
    state = occ.occupancy_init(cfg)
    density = np.zeros(cfg.num_cells, np.float32)
    density[0] = 10.0
    state = occ.prune_update(state, cfg, jnp.asarray(density),
                             density_decay=0.6, min_density=1.0)
    assert bool(state['occ'].reshape(-1)[0])
    assert int(state['occ'].sum()) == 1


def test_raymarch_ray_masks_empty_space():
    cfg = occ.OccupancyGridConfig(level=3)
    state = occ.occupancy_init(cfg)
    # only occupy the +x half
    res = cfg.res
    half = np.zeros((res, res, res), bool)
    half[res // 2:] = True
    state = {**state, 'occ': jnp.asarray(half)}
    rays = make_rays(np.asarray([[-2.0, 0.0, 0.0]]), np.asarray([[1.0, 0.0, 0.0]]),
                     0.0, 4.0)
    m = occ.raymarch_ray(state, cfg, rays, 64, jax.random.PRNGKey(0))
    x = np.asarray(m['samples'][0, :, 0])
    mask = np.asarray(m['mask'][0])
    assert mask.sum() > 0
    assert np.all(x[mask] >= 0.0)          # only +x half occupied
    assert np.all(np.abs(np.asarray(m['samples'][0, mask])[:, 1:]) <= 1.0)


def test_deltas_match_reference_formula():
    """deltas = diff(depth, prepend=dist_min) (octree_as.py:272-273)."""
    cfg = occ.OccupancyGridConfig(level=2)
    state = occ.occupancy_init(cfg)
    rays = make_rays(np.zeros((2, 3)), np.asarray([[0, 0, 1.], [0, 1., 0]]), 0.5, 3.0)
    m = occ.raymarch_ray(state, cfg, rays, 32, jax.random.PRNGKey(1))
    depth = np.asarray(m['depth'])
    deltas = np.asarray(m['deltas'])
    want = np.diff(depth, axis=-1, prepend=0.5)
    np.testing.assert_allclose(deltas, want, rtol=1e-5, atol=1e-6)


def test_volume_integration_matches_bruteforce():
    rng = np.random.RandomState(0)
    R, S = 4, 16
    color = rng.rand(R, S, 3).astype(np.float32)
    density = rng.rand(R, S).astype(np.float32) * 5
    deltas = rng.rand(R, S).astype(np.float32) * 0.1
    depth = np.cumsum(deltas, -1).astype(np.float32)
    mask = rng.rand(R, S) > 0.3

    rgb, alpha, dep = rf_tracer.volume_integrate(
        jnp.asarray(color), jnp.asarray(density), jnp.asarray(deltas),
        jnp.asarray(depth), jnp.asarray(mask))

    # brute force per ray over the packed (masked-kept) samples
    for r in range(R):
        T = 1.0
        acc = np.zeros(3)
        acc_a = 0.0
        acc_d = 0.0
        for s in range(S):
            if not mask[r, s]:
                continue
            tau = density[r, s] * deltas[r, s]
            w = T * (1 - np.exp(-tau))
            acc += w * color[r, s]
            acc_a += w
            acc_d += w * depth[r, s]
            T *= np.exp(-tau)
        np.testing.assert_allclose(np.asarray(rgb[r]), acc, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(alpha[r, 0]), acc_a, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(dep[r, 0]), acc_d, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_compact_eval_matches_dense():
    """Fixed-budget compaction must reproduce the dense masked trace."""
    cfg = occ.OccupancyGridConfig(level=2)
    state = occ.occupancy_init(cfg)
    rng = np.random.RandomState(0)
    R, S = 8, 32
    rays = make_rays(rng.randn(R, 3) * 0.1 + np.asarray([0, 0, -2.0]),
                     np.broadcast_to(np.asarray([0, 0, 1.0]), (R, 3)), 0.0, 4.0)

    def field_fn(coords, dirs):
        c = jax.nn.sigmoid(coords * 2.0)
        d = jax.nn.relu(coords[..., :1].sum(-1, keepdims=True) + 0.5)
        return c, d

    k = jax.random.PRNGKey(0)
    dense = rf_tracer.trace(field_fn, state, cfg,
                            rf_tracer.RFTracerConfig('ray', S, max_samples=0),
                            rays, k)
    compact = rf_tracer.trace(field_fn, state, cfg,
                              rf_tracer.RFTracerConfig('ray', S, max_samples=R * S // 2 + 64),
                              rays, k)
    # budget >= num valid samples here, so results must match
    np.testing.assert_allclose(np.asarray(dense['rgb']), np.asarray(compact['rgb']),
                               rtol=1e-4, atol=1e-5)


def synthetic_scene(num_views=24, res=32):
    """Analytic solid-sphere scene: GT renders + cameras on a circle."""
    h = w = res
    fx = fy = res * 1.2
    radius = 0.5
    rgbs, rays_os, rays_ds = [], [], []
    for v in range(num_views):
        theta = 2 * np.pi * v / num_views
        cam_pos = np.asarray([2.5 * np.cos(theta), 0.8, 2.5 * np.sin(theta)], np.float32)
        fwd = -cam_pos / np.linalg.norm(cam_pos)
        right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0] = right; c2w[:3, 1] = up; c2w[:3, 2] = -fwd; c2w[:3, 3] = cam_pos
        o, d = pinhole_rays(c2w, h, w, fx, fy)
        # analytic ray-sphere render
        b = np.sum(o * d, -1)
        c = np.sum(o * o, -1) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        p = o + d * t[:, None]
        n = p / radius
        col = np.where(hit[:, None], 0.5 + 0.5 * n, 1.0).astype(np.float32)
        rgbs.append(col); rays_os.append(o); rays_ds.append(d)
    return MultiviewData(rgb=np.stack(rgbs), rays_o=np.stack(rays_os),
                         rays_d=np.stack(rays_ds),
                         masks=np.ones((num_views, h * w, 1), bool),
                         h=h, w=w, dist_min=0.0, dist_max=5.0)


@pytest.mark.slow
def test_nerf_converges_on_synthetic_scene():
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    data = synthetic_scene()
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=6, min_grid_res=4, max_grid_res=64,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=10, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(
        grid=grid, hidden_dim=32, num_layers=1,
        view_embedder='positional', view_multires=4, blas_level=4,
        prune_min_density=1.0)
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=128,
                                    bg_color='white')
    cfg = MultiviewTrainerConfig(epochs=20, prune_every=300, chunk_size=50,
                                 use_sga=True, temperature=0.1,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4)
    trainer = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=512, seed=0)
    trainer.train(num_iterations=600)
    m = trainer.evaluate(view_indices=[0])
    assert m['psnr'] > 16.0, f'NeRF did not converge: {m}'
    # pruning must have removed most empty space (sphere fills ~6% of cube)
    occ_frac = float(jnp.mean(trainer.occ_state['occ']))
    assert occ_frac < 0.9


@pytest.mark.slow
def test_adaptive_budget_shrinks_after_prune():
    """adaptive_budget: post-prune occupancy collapse must shrink the
    compaction budget (power-of-2 ladder) and keep training healthy."""
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    data = synthetic_scene(num_views=8, res=24)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=4, min_grid_res=4, max_grid_res=32,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=9, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(
        grid=grid, hidden_dim=16, num_layers=1,
        view_embedder='positional', view_multires=2, blas_level=4,
        prune_min_density=1.0)
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=64,
                                    bg_color='white', max_samples=8192)
    cfg = MultiviewTrainerConfig(epochs=20, prune_every=150, chunk_size=50,
                                 use_sga=True, temperature=0.1,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4,
                                 adaptive_budget=True, min_budget=512)
    trainer = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=256, seed=0)
    trainer.train(num_iterations=100)
    assert trainer.active_tracer_cfg.max_samples == 8192

    # collapse occupancy to a small region (as a long prune phase would)
    # and adapt: the budget must shrink on the pow-2 ladder.  The estimator
    # probes real rays, so the fraction is the along-ray occupied fraction
    # (not the volumetric one).
    res = mcfg.occ_cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.25 ** 2
    trainer.occ_state = {**trainer.occ_state, 'occ': jnp.asarray(sphere)}
    trainer._adapt_budget()
    new_budget = trainer.active_tracer_cfg.max_samples
    assert new_budget < 8192, new_budget
    assert new_budget >= 512 and (new_budget & (new_budget - 1)) == 0
    # training continues fine at the shrunk budget
    out = trainer.train(num_iterations=100)
    assert out['iterations'] == 200
    m = trainer.evaluate(view_indices=[0])
    assert np.isfinite(m['psnr']) and m['psnr'] > 10.0, m


@pytest.mark.slow
def test_segmented_trace_matches_dense():
    """segment_size > 0: coarse segment culling + budgeted eval must render
    exactly what the dense path renders when budgets are sufficient (skipped
    samples have zero density either way)."""
    cfg = occ.OccupancyGridConfig(level=5)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55 ** 2
    state = {**state, 'occ': jnp.asarray(sphere)}

    def field_fn(coords, dirs):
        d = jnp.sum(coords ** 2, -1, keepdims=True)
        color = 0.5 + 0.4 * jnp.sin(3.0 * coords + dirs)
        return color, 4.0 * jnp.exp(-2.0 * d)

    R, S = 64, 256
    rng_rays = np.random.RandomState(0)
    o = np.asarray([[2.0, 0.3, 0.1]], np.float32) + np.zeros((R, 3), np.float32)
    to_pts = rng_rays.uniform(-0.8, 0.8, (R, 3)).astype(np.float32)
    d = to_pts - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(o, d, 0.0, 4.0)
    key = jax.random.PRNGKey(7)

    dense_cfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=S, bg_color='white',
        max_samples=R * S)  # budget = everything
    seg_cfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=S, bg_color='white',
        max_samples=R * S, segment_size=8, seg_budget=R * S // 8,
        coarse_level=4, seg_dilation=2)
    out_d = rf_tracer.trace(field_fn, state, cfg, dense_cfg, rays, key)
    out_s = rf_tracer.trace(field_fn, state, cfg, seg_cfg, rays, key)
    np.testing.assert_allclose(np.asarray(out_s['rgb']),
                               np.asarray(out_d['rgb']), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s['alpha']),
                               np.asarray(out_d['alpha']), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s['depth']),
                               np.asarray(out_d['depth']), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_segmented_trace_budget_truncation_is_graceful():
    """Over-budget segmented tracing must stay finite and reasonable."""
    cfg = occ.OccupancyGridConfig(level=4)
    state = occ.occupancy_init(cfg)   # fully occupied: worst case

    def field_fn(coords, dirs):
        return jnp.full(coords.shape[:-1] + (3,), 0.5), \
            jnp.ones(coords.shape[:-1] + (1,))

    R, S = 32, 128
    o = np.zeros((R, 3), np.float32); o[:, 0] = 2.5
    d = np.zeros((R, 3), np.float32); d[:, 0] = -1.0
    rays = make_rays(o, d, 0.0, 5.0)
    seg_cfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=S, bg_color='white',
        max_samples=256, segment_size=8, seg_budget=64,
        coarse_level=4, seg_dilation=2)
    out = rf_tracer.trace(field_fn, state, cfg, seg_cfg, rays,
                          jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out['rgb'])).all()
    assert float(jnp.max(out['alpha'])) <= 1.0 + 1e-5


@pytest.mark.slow
def test_deferred_fine_mode_matches_exact():
    """fine_mode='deferred' (paged path): coarse-prefix stage-2 compaction +
    late per-sample fine query renders exactly what 'exact' renders when
    eval_seg_budget covers the live segments, including under budget
    truncation parity (same stride-uniform drop rule)."""
    cfg = occ.OccupancyGridConfig(level=5)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55 ** 2
    state = {**state, 'occ': jnp.asarray(sphere)}

    def encode_fn(coords, grouping):
        return jnp.concatenate([jnp.sin(2.0 * coords), coords ** 2], -1)

    def head_fn(feats, dirs):
        color = 0.5 + 0.4 * jnp.tanh(feats[..., :3] + dirs)
        density = 3.0 * jax.nn.sigmoid(jnp.sum(feats[..., 3:], -1,
                                               keepdims=True))
        return color, density

    R, S = 48, 256
    rng_rays = np.random.RandomState(3)
    o = np.asarray([[2.0, 0.3, 0.1]], np.float32) + np.zeros((R, 3),
                                                             np.float32)
    to_pts = rng_rays.uniform(-0.8, 0.8, (R, 3)).astype(np.float32)
    d = to_pts - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(o, d, 0.0, 4.0)
    key = jax.random.PRNGKey(11)

    def run(fine_mode, k2):
        tc = rf_tracer.RFTracerConfig(
            raymarch_type='ray', num_steps=S, bg_color='white',
            max_samples=4096, segment_size=8, seg_budget=1024,
            coarse_level=4, seg_dilation=2, eval_seg_budget=k2,
            group_segs_per_block=4, fine_mode=fine_mode)
        return rf_tracer.trace(None, state, cfg, tc, rays, key,
                               encode_split=(encode_fn, head_fn))

    out_e = run('exact', 1024)
    out_d = run('deferred', 1024)
    for ch in ('rgb', 'alpha', 'depth'):
        np.testing.assert_allclose(np.asarray(out_d[ch]),
                                   np.asarray(out_e[ch]),
                                   rtol=1e-5, atol=1e-5, err_msg=ch)
    # under truncation both modes must stay finite and composited
    out_t = run('deferred', 64)
    assert np.isfinite(np.asarray(out_t['rgb'])).all()
    assert float(jnp.max(out_t['alpha'])) <= 1.0 + 1e-5


def test_validate_segment_cover_raises_on_undersized_dilation():
    ocfg = occ.OccupancyGridConfig(level=7)
    bad = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=2048,
                                   max_samples=1024, segment_size=32,
                                   coarse_level=6, seg_dilation=1)
    with pytest.raises(ValueError, match='coarse cover'):
        rf_tracer.validate_segment_cover(bad, ocfg, 0.0, 5.0)
    good = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=2048,
                                    max_samples=1024, segment_size=16,
                                    coarse_level=5, seg_dilation=1)
    rf_tracer.validate_segment_cover(good, ocfg, 0.0, 5.0)
    odd = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=100,
                                   max_samples=1024, segment_size=16)
    with pytest.raises(ValueError, match='divide'):
        rf_tracer.validate_segment_cover(odd, ocfg, 0.0, 5.0)


@pytest.mark.slow
def test_segmented_trace_clamps_coarse_level_to_occ_level():
    """coarse_level above the occupancy level must clamp, not crash."""
    cfg = occ.OccupancyGridConfig(level=4)      # res 16 < 2**coarse_level
    state = occ.occupancy_init(cfg)

    def field_fn(coords, dirs):
        return jnp.full(coords.shape[:-1] + (3,), 0.4), \
            jnp.ones(coords.shape[:-1] + (1,))

    R, S = 8, 64
    o = np.zeros((R, 3), np.float32); o[:, 2] = -2.5
    d = np.zeros((R, 3), np.float32); d[:, 2] = 1.0
    rays = make_rays(o, d, 0.0, 5.0)
    seg_cfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=S, max_samples=256,
        segment_size=8, coarse_level=6, seg_dilation=1)
    out = rf_tracer.trace(field_fn, state, cfg, seg_cfg, rays,
                          jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out['rgb'])).all()


def test_adaptive_segment_budgets_shrink_after_prune():
    """adaptive_budget on the paged path: post-prune occupancy collapse must
    shrink seg_budget/eval_seg_budget (pow-2 ladder) alongside max_samples,
    and keep max_samples <= eval_seg_budget * segment_size."""
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    data = synthetic_scene(num_views=4, res=16)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=4, min_grid_res=16, max_grid_res=64,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=17, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(
        grid=grid, hidden_dim=16, num_layers=1,
        view_embedder='positional', view_multires=2, blas_level=5)
    tcfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=512, bg_color='white',
        max_samples=4096, segment_size=4, seg_budget=4096,
        coarse_level=5, seg_dilation=1, eval_seg_budget=2048,
        group_segs_per_block=8, fine_mode='deferred')
    cfg = MultiviewTrainerConfig(epochs=20, prune_every=-1, chunk_size=10,
                                 use_sga=True, temperature=0.1,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4,
                                 adaptive_budget=True, min_budget=256)
    trainer = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=64, seed=0)

    # collapse occupancy to a small sphere, as a long prune phase would
    res = mcfg.occ_cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.2 ** 2
    trainer.occ_state = {**trainer.occ_state, 'occ': jnp.asarray(sphere)}
    trainer._refresh_coarse()
    trainer._adapt_budget()
    act = trainer.active_tracer_cfg
    assert act.eval_seg_budget < 2048, act.eval_seg_budget
    assert act.seg_budget < 4096, act.seg_budget
    assert act.seg_budget >= act.eval_seg_budget
    for v in (act.eval_seg_budget, act.seg_budget, act.max_samples):
        assert v > 0 and (v & (v - 1)) == 0, v
    assert act.max_samples <= act.eval_seg_budget * act.segment_size
    # the chunk-fn cache keys on the full active cfg (other budgets' fns
    # stay cached so probe oscillation around a pow2 rung never recompiles)
    assert all(f[2] is not None for f in trainer._fns
               if isinstance(f, tuple) and f[0] == 'chunk')


@pytest.mark.slow
def test_amp_head_close_to_f32():
    """cfg.amp=True runs the MLP head in bf16 (reference AMP autocast,
    base_trainer.py:386) — outputs f32, close to the f32 head."""
    import dataclasses
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs import nerf as nerf_mod
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig

    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=8, init_grid='normal')
    cfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=32, num_layers=1,
                                    view_embedder='positional',
                                    view_multires=2, blas_level=4)
    params = nerf_mod.nerf_init(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (64, cfg.density_mlp_cfg.input_dim))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    c32, d32 = nerf_mod.nerf_head(params, cfg, feats, dirs)
    camp, damp = nerf_mod.nerf_head(
        params, dataclasses.replace(cfg, amp=True), feats, dirs)
    assert camp.dtype == jnp.float32 and damp.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(camp), np.asarray(c32), atol=0.05)
    np.testing.assert_allclose(np.asarray(damp), np.asarray(d32),
                               rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_voxel_paged_trace_matches_dense():
    """'voxel' marching through the paged trace (encode_split): each
    intersected cell's sample group rides the segment machinery — must
    render exactly what the dense voxel path renders when budgets cover
    the live cells."""
    cfg = occ.OccupancyGridConfig(level=4)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55 ** 2
    state = {**state, 'occ': jnp.asarray(sphere)}

    def encode_fn(coords, grouping):
        return jnp.concatenate([jnp.sin(2.0 * coords), coords ** 2], -1)

    def head_fn(feats, dirs):
        color = 0.5 + 0.4 * jnp.tanh(feats[..., :3] + dirs)
        density = 3.0 * jax.nn.sigmoid(jnp.sum(feats[..., 3:], -1,
                                               keepdims=True))
        return color, density

    def field_fn(coords, dirs):
        return head_fn(encode_fn(coords, None), dirs)

    R = 32
    rng_rays = np.random.RandomState(5)
    o = np.asarray([[2.0, 0.3, 0.1]], np.float32) + np.zeros((R, 3),
                                                             np.float32)
    to_pts = rng_rays.uniform(-0.7, 0.7, (R, 3)).astype(np.float32)
    d = to_pts - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(o, d, 0.0, 4.0)
    key = jax.random.PRNGKey(13)

    base = dict(raymarch_type='voxel', num_steps=8, bg_color='white',
                max_intersections=32)
    tc_dense = rf_tracer.RFTracerConfig(**base)
    out_dense = rf_tracer.trace(field_fn, state, cfg, tc_dense, rays, key)
    tc_paged = rf_tracer.RFTracerConfig(**base, max_samples=4096,
                                        eval_seg_budget=1024,
                                        group_segs_per_block=8)
    out_paged = rf_tracer.trace(None, state, cfg, tc_paged, rays, key,
                                encode_split=(encode_fn, head_fn))
    for ch in ('rgb', 'alpha', 'depth'):
        np.testing.assert_allclose(np.asarray(out_paged[ch]),
                                   np.asarray(out_dense[ch]),
                                   rtol=1e-4, atol=1e-4, err_msg=ch)


@pytest.mark.slow
def test_kernel_fine_mode_matches_deferred():
    """fine_mode='kernel' (in-kernel fine occupancy): with ample budgets the
    training trajectory must match fine_mode='deferred' exactly — the
    occupancy row reproduces occ.query bit-for-bit, grouping differences
    (dilated vs exact sub-segment liveness) change only which pad blocks
    compute, and the kernel rows for live samples are identical."""
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    def make(fine_mode):
        data = synthetic_scene(num_views=4, res=16)
        grid = LatentGridConfig.from_geometric(
            feature_dim=2, num_lods=4, min_grid_res=16, max_grid_res=64,
            latent_dim=1, multiscale_type='cat', resolution_dim=3,
            feature_std=0.02, codebook_bitwidth=17, init_grid='normal',
            num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
        ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                         ldec_std=0.1, use_sga=True, diff_sampling=True))
        mcfg = NeuralRadianceFieldConfig(
            grid=grid, hidden_dim=16, num_layers=1,
            view_embedder='positional', view_multires=2, blas_level=7)
        tcfg = rf_tracer.RFTracerConfig(
            raymarch_type='ray', num_steps=512, bg_color='white',
            max_samples=4096, segment_size=4, seg_budget=4096,
            coarse_level=5, seg_dilation=1, eval_seg_budget=2048,
            group_segs_per_block=8, fine_mode=fine_mode)
        cfg = MultiviewTrainerConfig(epochs=20, prune_every=8, chunk_size=4,
                                     use_sga=True, temperature=0.1,
                                     entropy_reg=1e-4, entropy_reg_end=1e-4)
        return MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=64, seed=0)

    td = make('deferred')
    td.train(num_iterations=16)
    tk = make('kernel')
    assert 'occ_slab' in tk.occ_state and 'fine_dil' in tk.occ_state
    tk.train(num_iterations=16)
    np.testing.assert_allclose(
        np.asarray(tk.params['grid']['codebook']),
        np.asarray(td.params['grid']['codebook']), rtol=2e-4, atol=2e-4)
    # render path falls back to the deferred query and stays finite
    img = tk.render_view(0)
    assert np.isfinite(img).all()


def _two_wall_scene(level=5):
    """Occupancy + trained-like density cache: an opaque wall at x in
    [-0.625,-0.375] fully occludes a second wall at x in [0.375,0.625].
    Wall faces sit ON cell boundaries (multiples of 1/8) so the per-cell
    decayed-max density cache equals the true field density everywhere —
    culling decisions are then exact, not conservative-with-headroom."""
    cfg = occ.OccupancyGridConfig(level=level)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, _, _ = np.meshgrid(g, g, g, indexing='ij')
    wall1 = (xx > -0.625) & (xx < -0.375)
    wall2 = (xx > 0.375) & (xx < 0.625)
    dens = 400.0 * wall1 + 300.0 * wall2
    state = {**state, 'occ': jnp.asarray(wall1 | wall2),
             'density': jnp.asarray(dens, jnp.float32)}

    def field_fn(coords, dirs):
        x = coords[..., 0]
        in1 = ((x > -0.625) & (x < -0.375)).astype(jnp.float32)
        in2 = ((x > 0.375) & (x < 0.625)).astype(jnp.float32)
        density = (400.0 * in1 + 300.0 * in2)[..., None]
        color = jnp.stack([in1, in2, jnp.zeros_like(x)], -1)
        return color, density

    return cfg, state, field_fn


def _axis_rays(R, seed=7):
    o = np.asarray([[-2.0, 0.0, 0.0]], np.float32) + np.zeros((R, 3),
                                                              np.float32)
    rng_rays = np.random.RandomState(seed)
    to = rng_rays.uniform(-0.3, 0.3, (R, 3)).astype(np.float32)
    to[:, 0] = 0.0
    d = to - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return make_rays(o, d, 0.0, 4.0)


@pytest.mark.slow
def test_term_tau_culls_occluded_ray_segments():
    """term_tau transmittance culling ('ray'): segments behind the opaque
    wall are dropped from stage-1 (their integration weight is ~e^-80)
    while the render matches the un-culled one; with a zero density cache
    (pre-prune) nothing is culled."""
    cfg, state, field_fn = _two_wall_scene()
    rays = _axis_rays(32)
    key = jax.random.PRNGKey(5)

    def run(state, term_tau):
        tc = rf_tracer.RFTracerConfig(
            raymarch_type='ray', num_steps=256, bg_color='white',
            max_samples=4096, segment_size=8, seg_budget=1024,
            coarse_level=4, seg_dilation=2, term_tau=term_tau)
        out = rf_tracer.trace(field_fn, state, cfg, tc, rays, key)
        _, _, mask_c = rf_tracer.coarse_segment_live(state, cfg, tc, rays,
                                                     key)
        return out, int(jnp.sum(mask_c))

    out0, live0 = run(state, 0.0)
    out1, live1 = run(state, 11.0)
    assert live1 < live0, (live1, live0)
    for ch in ('rgb', 'alpha', 'depth'):
        np.testing.assert_allclose(np.asarray(out1[ch]),
                                   np.asarray(out0[ch]),
                                   atol=1e-4, err_msg=ch)
    # conservative pre-prune: zero density cache culls nothing
    state_z = {**state, 'density': jnp.zeros_like(state['density'])}
    _, live_z = run(state_z, 11.0)
    assert live_z == live0, (live_z, live0)
    # precomputed packed grid path (trainer stash) gives the same cull
    tc = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=256, bg_color='white',
        max_samples=4096, segment_size=8, seg_budget=1024,
        coarse_level=4, seg_dilation=2, term_tau=11.0)
    state_p = {**state,
               'coarse2': rf_tracer.coarse_packed_grid(state, cfg, tc)}
    _, _, mask_p = rf_tracer.coarse_segment_live(state_p, cfg, tc, rays, key)
    assert int(jnp.sum(mask_p)) == live1


@pytest.mark.slow
def test_term_tau_culls_occluded_voxel_cells():
    """term_tau transmittance culling ('voxel' paged trace): occluded
    cell intersections are dropped while the render matches; the paged
    and dense voxel paths agree under culling."""
    cfg, state, field_fn = _two_wall_scene(level=4)
    rays = _axis_rays(24, seed=9)
    key = jax.random.PRNGKey(13)

    def encode_fn(coords, grouping):
        return jnp.concatenate([jnp.sin(2.0 * coords), coords], -1)

    def head_fn(feats, dirs):
        x = feats[..., 3]           # coords x channel survives the encode
        in1 = ((x > -0.625) & (x < -0.375)).astype(jnp.float32)
        in2 = ((x > 0.375) & (x < 0.625)).astype(jnp.float32)
        density = (400.0 * in1 + 300.0 * in2)[..., None]
        color = jnp.stack([in1, in2, jnp.zeros_like(x)], -1)
        return color, density

    base = dict(raymarch_type='voxel', num_steps=8, bg_color='white',
                max_intersections=32, max_samples=4096, eval_seg_budget=512,
                group_segs_per_block=8)

    def run_paged(term_tau):
        tc = rf_tracer.RFTracerConfig(**base, term_tau=term_tau)
        return rf_tracer.trace(None, state, cfg, tc, rays, key,
                               encode_split=(encode_fn, head_fn))

    out0 = run_paged(0.0)
    out1 = run_paged(11.0)
    for ch in ('rgb', 'alpha', 'depth'):
        np.testing.assert_allclose(np.asarray(out1[ch]),
                                   np.asarray(out0[ch]),
                                   atol=1e-4, err_msg=ch)
    # the culling itself must drop occluded cells
    m = occ.raymarch_voxel(state, cfg, rays, 8, key, 32)
    keep = rf_tracer.voxel_term_mask(state, cfg, m, 24, 32, 8, 11.0)
    live_cells = m['mask'].reshape(24, 32, 8).any(-1)
    assert int(jnp.sum(live_cells & ~keep)) > 0
    # dense (non-paged) voxel path matches too
    tc_d = rf_tracer.RFTracerConfig(raymarch_type='voxel', num_steps=8,
                                    bg_color='white', max_intersections=32,
                                    term_tau=11.0)
    out_d = rf_tracer.trace(field_fn, state, cfg, tc_d, rays, key)
    np.testing.assert_allclose(np.asarray(out1['rgb']),
                               np.asarray(out_d['rgb']), atol=1e-4)


@pytest.mark.slow
def test_trainer_term_tau_trains():
    """End-to-end training with transmittance culling on: the trainer
    stashes the packed coarse grid at prune refreshes, the adaptive
    budgets stay valid, and training stays finite."""
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    data = synthetic_scene(num_views=4, res=16)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=4, min_grid_res=16, max_grid_res=64,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=17, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(
        grid=grid, hidden_dim=16, num_layers=1,
        view_embedder='positional', view_multires=2, blas_level=7)
    tcfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=512, bg_color='white',
        max_samples=4096, segment_size=4, seg_budget=4096,
        coarse_level=5, seg_dilation=1, eval_seg_budget=2048,
        group_segs_per_block=8, fine_mode='deferred', term_tau=11.0)
    cfg = MultiviewTrainerConfig(epochs=20, prune_every=8, chunk_size=4,
                                 use_sga=True, temperature=0.1,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4,
                                 adaptive_budget=True, min_budget=512)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=64, seed=0)
    assert 'coarse2' in tr.occ_state
    assert tr.occ_state['coarse2'].shape[-1] == 2
    tr.train(num_iterations=16)
    assert np.isfinite(np.asarray(tr.params['grid']['codebook'])).all()
    img = tr.render_view(0)
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_group_seg_size_renders_identically():
    """group_seg_size (sub-segment grouping granularity) only changes which
    kernel blocks the rows land in — with ample budgets the paged render
    must match the whole-segment grouping exactly, in both fine modes."""
    cfg = occ.OccupancyGridConfig(level=5)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55 ** 2
    state = {**state, 'occ': jnp.asarray(sphere)}

    def encode_fn(coords, grouping):
        return jnp.concatenate([jnp.sin(2.0 * coords), coords ** 2], -1)

    def head_fn(feats, dirs):
        color = 0.5 + 0.4 * jnp.tanh(feats[..., :3] + dirs)
        density = 3.0 * jax.nn.sigmoid(jnp.sum(feats[..., 3:], -1,
                                               keepdims=True))
        return color, density

    R, S = 32, 256
    rng_rays = np.random.RandomState(3)
    o = np.asarray([[2.0, 0.3, 0.1]], np.float32) + np.zeros((R, 3),
                                                             np.float32)
    to_pts = rng_rays.uniform(-0.8, 0.8, (R, 3)).astype(np.float32)
    d = to_pts - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(o, d, 0.0, 4.0)
    key = jax.random.PRNGKey(11)

    def run(gss, fine_mode):
        tc = rf_tracer.RFTracerConfig(
            raymarch_type='ray', num_steps=S, bg_color='white',
            max_samples=4096, segment_size=8, seg_budget=1024,
            coarse_level=4, seg_dilation=2, eval_seg_budget=1024,
            group_segs_per_block=4, group_seg_size=gss,
            fine_mode=fine_mode)
        return rf_tracer.trace(None, state, cfg, tc, rays, key,
                               encode_split=(encode_fn, head_fn))

    for fm in ('exact', 'deferred'):
        base = run(0, fm)
        sub = run(4, fm)
        for ch in ('rgb', 'alpha', 'depth'):
            np.testing.assert_allclose(np.asarray(sub[ch]),
                                       np.asarray(base[ch]),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f'{fm}:{ch}')


def test_raymarch_voxel_overflow_keeps_first_crossings():
    """When a ray crosses more occupied cells than max_intersections, the
    DDA keeps the FIRST I crossings in depth order, all marked valid."""
    cfg = occ.OccupancyGridConfig(level=4)
    state = occ.occupancy_init(cfg)      # all occupied: every cell hits
    rays = make_rays(np.asarray([[-2.0, 0.01, 0.02]], np.float32),
                     np.asarray([[1.0, 0.0, 0.0]], np.float32), 0.0, 4.0)
    I, S = 4, 2                          # res 16 -> ~16 crossings >> I
    m = occ.raymarch_voxel(state, cfg, rays, S, jax.random.PRNGKey(0), I)
    mask = np.asarray(m['mask']).reshape(1, I, S)
    depth = np.asarray(m['depth']).reshape(1, I, S)
    assert mask.all(), mask              # all I slots filled
    # crossings ascend in depth and start at the box entry (x=-1 -> t=1)
    starts = depth[0, :, 0]
    assert np.all(np.diff(starts) > 0), starts
    assert abs(starts[0] - 1.0) < 0.2, starts


@pytest.mark.slow
def test_lean_stage1_matches_deferred_statistically():
    """cfg.lean_stage1: the lean deferred march (analytic midpoints,
    counter-hash jitter, uniform span/(S-1) quadrature) renders the same
    image as the standard deferred path up to jitter noise — both are
    stratified estimators of the same integral — and is deterministic
    given its (2,)-seed input."""
    cfg = occ.OccupancyGridConfig(level=5)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55 ** 2
    state = {**state, 'occ': jnp.asarray(sphere)}

    def encode_fn(coords, grouping):
        return jnp.concatenate([jnp.sin(2.0 * coords), coords ** 2], -1)

    def head_fn(feats, dirs):
        color = 0.5 + 0.4 * jnp.tanh(feats[..., :3] + dirs)
        density = 3.0 * jax.nn.sigmoid(jnp.sum(feats[..., 3:], -1,
                                               keepdims=True))
        return color, density

    R, S = 48, 512
    rng_rays = np.random.RandomState(3)
    o = np.asarray([[2.0, 0.3, 0.1]], np.float32) + np.zeros((R, 3),
                                                             np.float32)
    to_pts = rng_rays.uniform(-0.8, 0.8, (R, 3)).astype(np.float32)
    d = to_pts - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(o, d, 0.0, 4.0)
    key = jax.random.PRNGKey(11)

    def run(lean, rng):
        tc = rf_tracer.RFTracerConfig(
            raymarch_type='ray', num_steps=S, bg_color='white',
            max_samples=8192, segment_size=8, seg_budget=2048,
            coarse_level=4, seg_dilation=2, eval_seg_budget=2048,
            group_segs_per_block=4, fine_mode='deferred', lean_stage1=lean)
        return rf_tracer.trace(None, state, cfg, tc, rays, rng,
                               encode_split=(encode_fn, head_fn))

    ref = run(False, key)
    lean = run(True, key)
    # same integral, different jitter stream: close but not bit-equal
    diff = np.abs(np.asarray(lean['rgb']) - np.asarray(ref['rgb']))
    assert diff.mean() < 0.01 and diff.max() < 0.08, (diff.mean(), diff.max())

    # deterministic given the pre-drawn (2,) seed array (shard_map input)
    u = jnp.asarray([0.3125, 0.7812], jnp.float32)
    a = run(True, u)
    b = run(True, u)
    np.testing.assert_array_equal(np.asarray(a['rgb']), np.asarray(b['rgb']))
    # and the jitter-shape contract advertises the seed form
    tc = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=S, segment_size=8,
        eval_seg_budget=2048, max_samples=8192, fine_mode='deferred',
        lean_stage1=True)
    assert rf_tracer.march_jitter_shape(tc, R) == (2,)


@pytest.mark.slow
def test_lean_stage1_budget_truncation_graceful():
    cfg = occ.OccupancyGridConfig(level=4)
    state = occ.occupancy_init(cfg)   # fully occupied -> heavy truncation

    def encode_fn(coords, grouping):
        return coords

    def head_fn(feats, dirs):
        return 0.5 + 0.0 * feats, jnp.ones_like(feats[..., :1])

    R, S = 16, 128
    o = np.zeros((R, 3), np.float32)
    o[:, 2] = -2.0
    d = np.zeros((R, 3), np.float32)
    d[:, 2] = 1.0
    rays = make_rays(o, d, 0.0, 4.0)
    tc = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=S, bg_color='white',
        max_samples=256, segment_size=8, coarse_level=4, seg_dilation=2,
        eval_seg_budget=32, group_segs_per_block=4,
        fine_mode='deferred', lean_stage1=True)
    out = rf_tracer.trace(None, state, cfg, tc, rays, jax.random.PRNGKey(0),
                          encode_split=(encode_fn, head_fn))
    assert np.isfinite(np.asarray(out['rgb'])).all()
    assert float(jnp.max(out['alpha'])) <= 1.0 + 1e-5


@pytest.mark.slow
def test_super_cull_matches_one_level():
    """super_factor two-level cull: identical rendering to the one-level
    lean march when budgets don't truncate (the super test is conservative
    and the same counter-hash jitter keys apply to surviving segments)."""
    cfg = occ.OccupancyGridConfig(level=5)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55 ** 2
    state = {**state, 'occ': jnp.asarray(sphere)}
    state = {**state,
             'density': jnp.asarray(sphere, jnp.float32) * 5.0}

    def encode_fn(coords, grouping):
        return jnp.concatenate([jnp.sin(2.0 * coords), coords ** 2], -1)

    def head_fn(feats, dirs):
        color = 0.5 + 0.4 * jnp.tanh(feats[..., :3] + dirs)
        density = 3.0 * jax.nn.sigmoid(jnp.sum(feats[..., 3:], -1,
                                               keepdims=True))
        return color, density

    R, S = 48, 512
    rng_rays = np.random.RandomState(3)
    o = np.asarray([[2.0, 0.3, 0.1]], np.float32) + np.zeros((R, 3),
                                                             np.float32)
    to_pts = rng_rays.uniform(-0.8, 0.8, (R, 3)).astype(np.float32)
    d = to_pts - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(o, d, 0.0, 4.0)
    u = jnp.asarray([0.25, 0.5], jnp.float32)   # fixed lean seed

    def run(superf, term_tau=0.0):
        tc = rf_tracer.RFTracerConfig(
            raymarch_type='ray', num_steps=S, bg_color='white',
            max_samples=8192, segment_size=8, coarse_level=4,
            seg_dilation=2, eval_seg_budget=2048, group_segs_per_block=4,
            fine_mode='deferred', lean_stage1=True, term_tau=term_tau,
            super_factor=superf,
            super_dilation=(rf_tracer.super_dilation_for(
                rf_tracer.RFTracerConfig(
                    raymarch_type='ray', num_steps=S, segment_size=8,
                    coarse_level=4, super_factor=superf),
                cfg, 0.0, 4.0) if superf > 1 else 0))
        rf_tracer.validate_segment_cover(tc, cfg, 0.0, 4.0)
        return rf_tracer.trace(None, state, cfg, tc, rays, u,
                               encode_split=(encode_fn, head_fn))

    for term in (0.0, 11.5):
        one = run(0, term)
        two = run(4, term)
        for ch in ('rgb', 'alpha', 'depth'):
            np.testing.assert_allclose(np.asarray(two[ch]),
                                       np.asarray(one[ch]),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f'{ch} term={term}')
