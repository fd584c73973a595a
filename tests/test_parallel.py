"""Multi-device data parallelism: sharded training matches single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shacira_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from shacira_tpu.datasets.image import ImageDataset
from shacira_tpu.models.grids.latent_grid import LatentGridConfig
from shacira_tpu.models.nefs.image import NeuralImageConfig
from shacira_tpu.trainers.image_trainer import ImageTrainer, ImageTrainerConfig


def _setup(mesh=None):
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3).astype(np.float32)
    ds = ImageDataset(img, sample_mode='full')
    grid = LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=4, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=6, init_grid='uniform',
        num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='max', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=8, num_layers=1)
    tcfg = ImageTrainerConfig(epochs=60, log_every=-1, entropy_reg=1e-4,
                              entropy_reg_end=1e-4, chunk_size=30,
                              norm='max')
    return ImageTrainer(tcfg, mcfg, ds, seed=0, mesh=mesh)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.size == 8          # conftest forces 8 virtual CPU devices


@pytest.mark.slow
def test_sharded_training_matches_single_device():
    t1 = _setup(mesh=None)
    t1.train(epochs=60, finalize=False)
    single = jax.tree.map(np.asarray, t1.params)

    t8 = _setup(mesh=make_mesh())
    t8.train(epochs=60, finalize=False)
    sharded = jax.tree.map(np.asarray, t8.params)

    # same rng stream + deterministic ops -> results match to fp tolerance
    # (reduction order differs across shards)
    cb1 = single['grid']['codebook']
    cb8 = sharded['grid']['codebook']
    np.testing.assert_allclose(cb1, cb8, rtol=5e-3, atol=5e-3)


def test_batch_actually_sharded():
    mesh = make_mesh()
    x = np.arange(64, dtype=np.float32).reshape(64, 1)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (8, 1)
    p = jax.device_put(np.ones(3), replicated(mesh))
    assert p.addressable_shards[0].data.shape == (3,)


@pytest.mark.slow
def test_device_sampled_training_under_mesh():
    """Sampled modes with device-side batch drawing run SPMD: params
    replicated, per-step drawn batch sharded across the data axis, and the
    result matches the single-device device-sampling path."""
    def setup(mesh):
        rng = np.random.RandomState(0)
        img = rng.rand(16, 16, 3).astype(np.float32)
        ds = ImageDataset(img, num_samples=64, sample_mode='woreplace',
                          seed=3)
        grid = LatentGridConfig.from_geometric(
            feature_dim=1, num_lods=4, min_grid_res=4, max_grid_res=16,
            latent_dim=1, multiscale_type='cat', resolution_dim=2,
            feature_std=0.1, codebook_bitwidth=6, init_grid='uniform',
            num_prob_layers=2, entropy_enabled=False)
        mcfg = NeuralImageConfig(grid=grid, hidden_dim=8, num_layers=1)
        tcfg = ImageTrainerConfig(epochs=40, log_every=-1, entropy_reg=0.0,
                                  chunk_size=20)
        return ImageTrainer(tcfg, mcfg, ds, seed=0, mesh=mesh)

    t1 = setup(None)
    t1.train(epochs=40, finalize=False)
    assert hasattr(t1, '_dev_img')
    single = np.asarray(t1.params['grid']['codebook'])

    t8 = setup(make_mesh())
    t8.train(epochs=40, finalize=False)
    assert hasattr(t8, '_dev_img')
    # params stayed replicated through training
    assert t8.params['grid']['codebook'].sharding.is_fully_replicated
    sharded = np.asarray(t8.params['grid']['codebook'])
    np.testing.assert_allclose(single, sharded, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_nerf_sharded_table_work_matches_single_device():
    """NeRF data-parallel step with SHARDED codebook-side table work: the
    SGA quantize / rate-loss / Adam moments of the latent table run on T/n
    rows per device (opt-state moments row-sharded, table intermediates
    constrained to the data axis) and must reproduce single-device params."""
    import sys
    sys.path.insert(0, 'tests')
    from test_nerf import synthetic_scene
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    def setup(mesh):
        data = synthetic_scene(num_views=8, res=16)
        grid = LatentGridConfig.from_geometric(
            feature_dim=2, num_lods=3, min_grid_res=8, max_grid_res=32,
            latent_dim=1, multiscale_type='cat', resolution_dim=3,
            feature_std=0.02, codebook_bitwidth=9, init_grid='normal',
            num_prob_layers=1, entropy_enabled=True,
        ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                         ldec_std=0.1, use_sga=True, diff_sampling=True))
        mcfg = NeuralRadianceFieldConfig(
            grid=grid, hidden_dim=16, num_layers=1,
            view_embedder='positional', view_multires=2, blas_level=4)
        tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=32,
                                        bg_color='white')
        cfg = MultiviewTrainerConfig(epochs=10, prune_every=-1,
                                     chunk_size=10, use_sga=True,
                                     temperature=0.5, entropy_reg=1e-4,
                                     entropy_reg_end=1e-4)
        return MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=64,
                                seed=0, mesh=mesh)

    t1 = setup(None)
    t1.train(num_iterations=40)
    single = np.asarray(t1.params['grid']['codebook'])

    t8 = setup(make_mesh())
    assert t8.shard_table_work, 'codebook rows must divide the mesh'
    # moments are row-sharded, params replicated
    mu_cb = t8.opt_state.mu['grid']['codebook']
    assert not mu_cb.sharding.is_fully_replicated
    t8.train(num_iterations=40)
    assert t8.params['grid']['codebook'].sharding.is_fully_replicated
    sharded = np.asarray(t8.params['grid']['codebook'])
    np.testing.assert_allclose(single, sharded, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_nerf_paged_shard_map_trace_matches_single_device():
    """The PAGED trace under jax.shard_map over the ray axis: march,
    budgeted compactions, segment grouping, and the paged Pallas encode
    kernels all run per-device at budgets/n, and training must reproduce
    the single-device trajectory.

    Budgets are made ample relative to a SPARSE (sphere-support) occupancy
    so that nothing truncates on either path — then per-device and global
    stride compaction keep the exact same rows, and the pre-drawn march
    jitter (occ.march_uniform) makes the sampled points identical.  (Under
    budget pressure the two paths drop different rows by design: the
    stride rule applies per shard.)"""
    import sys
    sys.path.insert(0, 'tests')
    from test_nerf import synthetic_scene
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    def setup(mesh):
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
            max_samples=8192, segment_size=4, seg_budget=4096,
            coarse_level=5, seg_dilation=1, eval_seg_budget=4096,
            group_segs_per_block=8, fine_mode='deferred')
        cfg = MultiviewTrainerConfig(epochs=20, prune_every=-1, chunk_size=4,
                                     use_sga=True, temperature=0.1,
                                     entropy_reg=1e-4, entropy_reg_end=1e-4)
        t = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=64,
                             seed=0, mesh=mesh)
        # sparse occupancy = the solid sphere's support (+1 cell margin):
        # live rows then sit well under the per-device budget slices
        res = 2 ** 7
        g = (np.arange(res) + 0.5) / res * 2.0 - 1.0
        xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
        sph = (xx ** 2 + yy ** 2 + zz ** 2) < (0.5 + 2.0 / res) ** 2
        t.occ_state = {**t.occ_state, 'occ': jnp.asarray(sph)}
        t._refresh_coarse()
        return t

    t1 = setup(None)
    t1.train(num_iterations=8)
    single = np.asarray(t1.params['grid']['codebook'])

    t8 = setup(make_mesh())
    t8.train(num_iterations=8)
    assert t8._shard_ray_active, 'paged trace must ride shard_map'
    sharded = np.asarray(t8.params['grid']['codebook'])
    np.testing.assert_allclose(single, sharded, rtol=5e-3, atol=5e-3)


def test_per_device_cfg_budget_division():
    from shacira_tpu.tracers import rf_tracer
    tc = rf_tracer.RFTracerConfig(max_samples=4096, segment_size=4,
                                  seg_budget=4096, eval_seg_budget=2048)
    d = rf_tracer.per_device_cfg(tc, 8)
    assert (d.max_samples, d.seg_budget, d.eval_seg_budget) == (512, 512, 256)
    assert d.num_steps == tc.num_steps          # per-ray: unchanged
    import pytest
    with pytest.raises(ValueError):
        rf_tracer.per_device_cfg(
            rf_tracer.RFTracerConfig(max_samples=100), 8)
