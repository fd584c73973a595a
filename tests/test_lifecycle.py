"""Trainer lifecycle: periodic validation/checkpointing, resume-mid-training
equivalence, model save formats, prob-model codec, stream decode roundtrip,
extra-channel integration, RenderBuffer channel kit.

Covers the reference lifecycle surface (base_trainer.py:334,377-443,
image_trainer.py:434-442, packed_rf_tracer.py:155-168, channel_fn.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shacira_tpu.trainers.image_trainer import ImageTrainer, ImageTrainerConfig
from shacira_tpu.datasets.image import ImageDataset
from shacira_tpu.utils import checkpoint
from test_image_trainer import tiny_image, make_model_cfg


def _params_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_resume_mid_training_is_exact(tmp_path):
    """Killing a run and resuming from resume_state.ckpt reproduces the
    uninterrupted run bit-exactly (ref resume_state, base_trainer.py:399-421)."""
    ds = ImageDataset(tiny_image(), sample_mode='full')
    mk = lambda: ImageTrainerConfig(
        epochs=8, chunk_size=4, log_every=100, use_sga=True, decay_period=0.9,
        temperature=0.1, norm='max', norm_every=4, entropy_reg=1e-3,
        entropy_reg_end=1e-4)

    t_full = ImageTrainer(mk(), make_model_cfg(), ds, seed=3)
    t_full.train(finalize=False)

    t_a = ImageTrainer(mk(), make_model_cfg(), ds, seed=3)
    t_a.train(epochs=4, finalize=False)
    path = str(tmp_path / 'resume_state.ckpt')
    checkpoint.save_trainer(t_a, path)

    t_b = ImageTrainer(mk(), make_model_cfg(), ds, seed=999)  # different seed
    checkpoint.restore_trainer(t_b, path)
    assert t_b.epoch == 4
    t_b.train(epochs=4, finalize=False)

    _params_equal(t_full.params, t_b.params)
    _params_equal(t_full.best_params, t_b.best_params)


@pytest.mark.slow
def test_periodic_validation_and_save(tmp_path):
    """valid_every tracks a best-by-validation state; save_every writes
    resume_state.ckpt mid-run (ref base_trainer.py:334,377-381)."""
    ds = ImageDataset(tiny_image(), sample_mode='full')
    cfg = ImageTrainerConfig(epochs=6, chunk_size=10, log_every=100,
                             valid_every=2, save_every=3,
                             entropy_reg=1e-3, entropy_reg_end=1e-4,
                             use_sga=True, norm='max')
    tr = ImageTrainer(cfg, make_model_cfg(), ds, seed=0,
                      log_dir=str(tmp_path))
    tr.train(finalize=False)
    assert tr.val_best_params is not None
    assert np.isfinite(tr.best_val_psnr) and tr.best_val_psnr > 0
    assert os.path.exists(tmp_path / 'resume_state.ckpt')
    # saved state restores the validation best too
    t2 = ImageTrainer(cfg, make_model_cfg(), ds, seed=1)
    checkpoint.restore_trainer(t2, str(tmp_path / 'resume_state.ckpt'))
    assert t2.best_val_psnr > 0


def test_grow_curriculum_masks_lods():
    """grow_every>0 trains with a growing active-LOD set
    (ref BaseTrainer.grow, base_trainer.py:348-364)."""
    ds = ImageDataset(tiny_image(), sample_mode='full')
    cfg = ImageTrainerConfig(epochs=6, chunk_size=2, log_every=100,
                             grow_every=2, growth_strategy='increase')
    tr = ImageTrainer(cfg, make_model_cfg(compressed=False), ds, seed=0)
    out = tr.train()
    assert np.isfinite(out['PSNR'])


def test_model_format_save_load(tmp_path):
    ds = ImageDataset(tiny_image(), sample_mode='full')
    cfg = ImageTrainerConfig(epochs=2, log_every=-1)
    mcfg = make_model_cfg(compressed=False)
    tr = ImageTrainer(cfg, mcfg, ds, seed=0)
    tr.train(finalize=False)
    for fmt in ('full', 'state_dict'):
        p = str(tmp_path / f'model_{fmt}.ckpt')
        checkpoint.save_model(p, tr.params, model_format=fmt,
                              configs={'model': mcfg})
        state = checkpoint.load_model(p)
        _params_equal(state['params'], tr.params)
        if fmt == 'full':
            assert state['configs']['model'] == mcfg


@pytest.mark.slow
def test_prob_model_codec_and_stream_roundtrip():
    """use_prob_model size accounting (entropy + codec) and the
    encode->decode roundtrip rebuilding round(codebook) exactly
    (ref latent_grid.py:138-174; decode is beyond the reference)."""
    from shacira_tpu.models.grids import latent_grid as lg
    ds = ImageDataset(tiny_image(), sample_mode='full')
    cfg = ImageTrainerConfig(epochs=30, log_every=-1, use_sga=True,
                             norm='max', entropy_reg=1e-3, entropy_reg_end=1e-4)
    mcfg = make_model_cfg()
    tr = ImageTrainer(cfg, mcfg, ds, seed=0)
    tr.train(finalize=False)
    gcfg = mcfg.grid
    params = jax.tree.map(np.asarray, tr.params)

    sizes = {}
    for pm in (False, True):
        for codec in (False, True):
            _, bits = lg.grid_size_bits(params['grid'], gcfg,
                                        use_codec=codec, use_prob_model=pm)
            sizes[(pm, codec)] = bits
            assert bits > 0
    # a real codestream is within a few percent of its entropy estimate
    assert sizes[(False, True)] < sizes[(False, False)] * 1.2 + 64
    # the model-CDF stream can't beat the empirical entropy by much
    assert sizes[(True, True)] >= sizes[(False, False)] * 0.8

    blob = lg.encode_grid_stream(params['grid'], gcfg)
    rebuilt = lg.decode_grid_stream(blob)
    np.testing.assert_array_equal(
        rebuilt, np.round(params['grid']['codebook']))
    blob_pm = lg.encode_grid_stream(params['grid'], gcfg, use_prob_model=True)
    rebuilt_pm = lg.decode_grid_stream(blob_pm)
    np.testing.assert_array_equal(
        rebuilt_pm, np.round(params['grid']['codebook']))


@pytest.mark.slow
def test_tracer_extra_channels():
    """Extra per-sample channels are volume-integrated with the same weights
    as rgb (ref packed_rf_tracer.py:155-168), on both the dense and the
    compacted path."""
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.accel import occupancy as occ
    from shacira_tpu.core.rays import make_rays

    occ_cfg = occ.OccupancyGridConfig(level=3)
    occ_state = occ.occupancy_init(occ_cfg, occupied=True)
    rng = jax.random.PRNGKey(0)
    R = 32
    o = np.zeros((R, 3), np.float32)
    o[:, 2] = -2.0
    d = np.zeros((R, 3), np.float32)
    d[:, 2] = 1.0
    d[:, 0] = np.linspace(-0.3, 0.3, R)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), 0.0, 4.0)

    def field(c, dirs):
        dens = jax.nn.relu(1.0 - 4.0 * jnp.sum(c * c, -1, keepdims=True))
        col = 0.5 + 0.5 * jnp.tanh(c)
        extras = {'feat': jnp.concatenate([c * 2.0, c[..., :1]], axis=-1)}
        return col, dens, extras

    cfg_dense = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=64,
                                         bg_color='white', max_samples=0)
    out_dense = jax.jit(lambda k: rf_tracer.trace(
        field, occ_state, occ_cfg, cfg_dense, rays, k))(rng)
    assert out_dense['feat'].shape == (R, 4)

    # brute-force check of the integration math for the extra channel
    m = occ.raymarch_ray(occ_state, occ_cfg, rays, 64, rng)
    col, dens, extras = field(m['samples'],
                              jnp.broadcast_to(d[:, None, :], m['samples'].shape))
    w = rf_tracer.integration_weights(dens[..., 0] * m['mask'], m['deltas'],
                                      jnp.ones_like(m['mask'], jnp.float32))
    ref = jnp.sum(w[..., None] * extras['feat'] * m['mask'][..., None], axis=-2)
    np.testing.assert_allclose(np.asarray(out_dense['feat']), np.asarray(ref),
                               atol=1e-4)

    # compacted path with a generous budget matches the dense path
    cfg_comp = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=64,
                                        bg_color='white', max_samples=R * 64)
    out_comp = jax.jit(lambda k: rf_tracer.trace(
        field, occ_state, occ_cfg, cfg_comp, rays, k))(rng)
    np.testing.assert_allclose(np.asarray(out_comp['feat']),
                               np.asarray(out_dense['feat']), atol=1e-4)


def test_renderbuffer_channel_kit():
    from shacira_tpu.core.renderbuffer import RenderBuffer
    from shacira_tpu.core import channel_fn as cf

    n = 8
    rng = np.random.RandomState(0)
    front = RenderBuffer({
        'rgb': jnp.asarray(rng.rand(n, 3), jnp.float32),
        'alpha': jnp.asarray(rng.rand(n, 1), jnp.float32),
        'normal': jnp.asarray(rng.randn(n, 3), jnp.float32),
        'hit': jnp.asarray(rng.rand(n, 1) > 0.5),
        'err': jnp.asarray(rng.rand(n, 1), jnp.float32),
        'depth': jnp.asarray(rng.rand(n, 1), jnp.float32),
    })
    back = RenderBuffer({k: jnp.asarray(rng.rand(*v.shape), jnp.float32)
                         if v.dtype != bool else jnp.asarray(rng.rand(*v.shape) > 0.5)
                         for k, v in front.channels.items()})
    out = front.blend(back)
    # alpha-over rgb
    a1, a2 = front.alpha, back.alpha
    expect = cf.blend_alpha_composite_over(front.rgb, back.rgb, a1, a2)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(expect), atol=1e-6)
    # hit is logical-or; depth is front-wins; err is additive
    np.testing.assert_array_equal(
        np.asarray(out.channels['hit']),
        np.asarray(front.channels['hit'] | back.channels['hit']))
    np.testing.assert_array_equal(np.asarray(out.channels['depth']),
                                  np.asarray(front.channels['depth']))
    np.testing.assert_allclose(
        np.asarray(out.channels['err']),
        np.asarray(front.channels['err'] + back.channels['err']), atol=1e-6)
    # slerp of normals stays unit-length
    norms = np.linalg.norm(np.asarray(out.channels['normal']), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # normalization kit
    disp = out.normalized()
    assert float(jnp.max(disp.channels['err'])) <= 1.0 + 1e-6
    # exr dict shapes
    d = out.exr_dict(2, 4)
    assert d['rgb'].shape == (2, 4, 3) and d['depth'].shape == (2, 4, 1)


@pytest.mark.slow
def test_multiview_lifecycle(tmp_path):
    """Multiview trainer: periodic val-split validation + checkpoint cadence
    (ref multiview_trainer.py:275-323) with decode-once view rendering."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_nerf import synthetic_scene
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    data = synthetic_scene(num_views=6, res=16)
    val = synthetic_scene(num_views=3, res=16)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=4, min_grid_res=4, max_grid_res=32,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.1, codebook_bitwidth=8, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=16, num_layers=1,
                                     blas_level=3)
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=16,
                                    bg_color='white')
    cfg = MultiviewTrainerConfig(epochs=2, chunk_size=6, prune_every=-1,
                                 valid_every=1, valid_views=2, save_every=1,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4,
                                 log_every=1)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=64, seed=0,
                          val_dataset=val, log_dir=str(tmp_path))
    tr.train()
    assert tr.val_best_params is not None
    assert np.isfinite(tr.best_val_psnr)
    assert os.path.exists(tmp_path / 'resume_state.ckpt')
    img = tr.render_view(0, dataset=val, ray_batch=100)  # pad-tail path
    assert img.shape == (16, 16, 3)


@pytest.mark.slow
def test_resume_default_trains_to_configured_end(tmp_path):
    """After restore, train() with no explicit count must finish the
    CONFIGURED schedule (absolute end), not run another full schedule —
    the bug pattern: resume at epoch k then train cfg.epochs more."""
    ds = ImageDataset(tiny_image(), sample_mode='full')
    mk = lambda: ImageTrainerConfig(
        epochs=8, chunk_size=4, log_every=100, use_sga=True, decay_period=0.9,
        temperature=0.1, norm='max', norm_every=4, entropy_reg=1e-3,
        entropy_reg_end=1e-4)
    t_a = ImageTrainer(mk(), make_model_cfg(), ds, seed=3)
    t_a.train(epochs=5, finalize=False)
    path = str(tmp_path / 'resume_state.ckpt')
    checkpoint.save_trainer(t_a, path)

    t_b = ImageTrainer(mk(), make_model_cfg(), ds, seed=0)
    checkpoint.restore_trainer(t_b, path)
    t_b.train(finalize=False)
    assert t_b.epoch == 8, t_b.epoch          # not 5 + 8

    # multiview analog
    from tests.test_nerf import synthetic_scene
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers.rf_tracer import RFTracerConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)
    data = synthetic_scene(num_views=4, res=16)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=8, init_grid='normal',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=8, num_layers=1,
                                     blas_level=3)
    trcfg = RFTracerConfig(raymarch_type='ray', num_steps=16)
    cfg = MultiviewTrainerConfig(epochs=5, prune_every=-1, chunk_size=4,
                                 use_sga=False)
    m_a = MultiviewTrainer(cfg, mcfg, trcfg, data, num_rays=32, seed=0)
    m_a.train(num_iterations=8)               # 2 epochs of 4 iters
    mpath = str(tmp_path / 'mv_resume.ckpt')
    checkpoint.save_trainer(m_a, mpath)
    m_b = MultiviewTrainer(cfg, mcfg, trcfg, data, num_rays=32, seed=9)
    checkpoint.restore_trainer(m_b, mpath)
    m_b.train()                               # default: to iteration 20
    assert m_b.iteration == 20, m_b.iteration
