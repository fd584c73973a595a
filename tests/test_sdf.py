"""SDF pipeline: field, sphere tracer, mesh ops, trainer convergence."""
import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.core.rays import make_rays
from shacira_tpu.accel import occupancy as occ
from shacira_tpu.tracers import sdf_tracer
from shacira_tpu.ops import mesh as mesh_ops
from shacira_tpu.ops.sdf import compute_sdf_iou
from shacira_tpu.datasets import sdf as sdf_ds
from shacira_tpu.models.grids.latent_grid import LatentGridConfig
from shacira_tpu.models.nefs.sdf import NeuralSDFConfig, neural_sdf_init, neural_sdf
from shacira_tpu.trainers.sdf_trainer import SDFTrainer, SDFTrainerConfig
import pytest


def sphere_sdf(p, r=0.5):
    return (np.linalg.norm(np.asarray(p), axis=-1, keepdims=True) - r).astype(np.float32)


def test_compute_sdf_iou():
    pred = np.asarray([-1, -1, 1, 1.])
    gts = np.asarray([-1, 1, -1, 1.])
    assert compute_sdf_iou(pred, gts) == 100.0 / 3.0
    assert compute_sdf_iou(gts, gts) == 100.0


def test_sphere_trace_analytic():
    """Sphere tracing an analytic sphere SDF must hit at the right depth."""
    cfg = occ.OccupancyGridConfig(level=3)
    state = occ.occupancy_init(cfg)
    rays = make_rays(np.asarray([[0, 0, -2.0], [0, 1.5, -2.0]]),
                     np.asarray([[0, 0, 1.0], [0, 0, 1.0]]), 0.0, 5.0)

    def sdf_fn(x):
        return jnp.linalg.norm(x, axis=-1, keepdims=True) - 0.5

    out = sdf_tracer.trace(sdf_fn, state, cfg,
                           sdf_tracer.SDFTracerConfig(num_steps=64), rays)
    hit = np.asarray(out['hit'])
    assert hit[0] and not hit[1]            # center ray hits, offset ray misses
    np.testing.assert_allclose(float(out['depth'][0, 0]), 1.5, atol=5e-3)


def test_sphere_trace_skips_empty_cells():
    """With only the sphere's cells occupied, empty space is skipped but the
    hit is identical."""
    cfg = occ.OccupancyGridConfig(level=4)
    state = occ.occupancy_init(cfg)
    ii = np.stack(np.meshgrid(*[np.arange(cfg.res)] * 3, indexing='ij'), -1)
    centers = ((ii + 0.5) / cfg.res) * 2 - 1
    occ_mask = np.linalg.norm(centers, axis=-1) < 0.75
    state = {**state, 'occ': jnp.asarray(occ_mask)}
    rays = make_rays(np.asarray([[0, 0, -2.0]]), np.asarray([[0, 0, 1.0]]), 0.0, 5.0)

    def sdf_fn(x):
        return jnp.linalg.norm(x, axis=-1, keepdims=True) - 0.5

    out = sdf_tracer.trace(sdf_fn, state, cfg,
                           sdf_tracer.SDFTracerConfig(num_steps=64), rays)
    assert bool(out['hit'][0])
    np.testing.assert_allclose(float(out['depth'][0, 0]), 1.5, atol=5e-3)


def test_mesh_sdf_on_cube():
    """points_to_sdf against an axis-aligned cube with known distances."""
    # unit cube [-0.5, 0.5]^3 as 12 triangles
    v = np.asarray([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                    for z in (-.5, .5)], np.float32)
    f = np.asarray([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],   # x- x+
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],   # y- y+
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],   # z- z+
    ], np.int32)
    pts = np.asarray([[0.0, 0.0, 0.9], [0.0, 0.0, 0.0], [0.7, 0.0, 0.0]], np.float32)
    sdf = mesh_ops.points_to_sdf(pts, v, f)
    np.testing.assert_allclose(sdf[0], 0.4, atol=1e-5)    # outside
    assert sdf[1] < 0                                      # inside
    np.testing.assert_allclose(abs(sdf[1]), 0.5, atol=1e-5)
    np.testing.assert_allclose(sdf[2], 0.2, atol=1e-5)


def test_surface_sampling_on_mesh():
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.asarray([[0, 1, 2]], np.int32)
    pts = mesh_ops.sample_surface(np.random.RandomState(0), v, f, 100)
    assert pts.shape == (100, 3)
    np.testing.assert_allclose(pts[:, 2], 0, atol=1e-6)
    assert np.all(pts[:, 0] + pts[:, 1] <= 1 + 1e-5)


def test_sdf_trainer_converges_and_iou():
    rng = np.random.RandomState(0)
    surf = rng.randn(1000, 3).astype(np.float32)
    surf = 0.5 * surf / np.linalg.norm(surf, axis=-1, keepdims=True)
    ds = sdf_ds.from_analytic(sphere_sdf, num_samples=20000, batch_size=2048,
                              surface_pts=surf, seed=0)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=4, min_grid_res=4, max_grid_res=32,
        latent_dim=0, multiscale_type='cat', resolution_dim=3,
        feature_std=0.01, codebook_bitwidth=8, init_grid='normal')
    mcfg = NeuralSDFConfig(grid=grid, hidden_dim=32, num_layers=1,
                           position_input=True)
    trainer = SDFTrainer(SDFTrainerConfig(epochs=40, chunk_size=50),
                         mcfg, ds, seed=0)
    trainer.train(num_iterations=300)
    m = trainer.validate()
    assert m['iou'] > 90, m


def test_growth_strategies():
    from shacira_tpu.core.schedulers import grow_loss_lods
    assert grow_loss_lods(0, 4, 10, 'onebyone') == [0]
    assert grow_loss_lods(25, 4, 10, 'onebyone') == [2]
    assert grow_loss_lods(25, 4, 10, 'increase') == [0, 1, 2]
    assert grow_loss_lods(25, 4, 10, 'shrink') == [2, 3]
    assert grow_loss_lods(25, 4, 10, 'finetocoarse') == [1, 2, 3]
    assert grow_loss_lods(25, 4, 10, 'onlylast') == [3]
    assert grow_loss_lods(999, 4, 10, 'increase') == [0, 1, 2, 3]


def test_sdf_trainer_with_growth():
    ds = sdf_ds.from_analytic(sphere_sdf, num_samples=4000, batch_size=512, seed=0)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=0, multiscale_type='cat', resolution_dim=3,
        feature_std=0.01, codebook_bitwidth=6, init_grid='normal')
    mcfg = NeuralSDFConfig(grid=grid, hidden_dim=16, num_layers=1)
    tr = SDFTrainer(SDFTrainerConfig(epochs=6, chunk_size=10, grow_every=2,
                                     growth_strategy='increase'),
                    mcfg, ds, seed=0)
    tr.train(num_iterations=40)
    assert tr.iteration == 40


@pytest.mark.slow
def test_sdf_render_shading_modes():
    """SDFTrainer.render: normal / matcap / shadow shading produce sane
    images of a trained sphere (ref offline_renderer shading paths +
    wisp/ops/shaders)."""
    rng = np.random.RandomState(0)
    surf = rng.randn(500, 3).astype(np.float32)
    surf = 0.5 * surf / np.linalg.norm(surf, axis=-1, keepdims=True)
    ds = sdf_ds.from_analytic(sphere_sdf, num_samples=8000, batch_size=2048,
                              surface_pts=surf, seed=0)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=4, min_grid_res=4, max_grid_res=32,
        latent_dim=0, multiscale_type='cat', resolution_dim=3,
        feature_std=0.01, codebook_bitwidth=8, init_grid='normal')
    mcfg = NeuralSDFConfig(grid=grid, hidden_dim=32, num_layers=1,
                           position_input=True)
    trainer = SDFTrainer(SDFTrainerConfig(epochs=30, chunk_size=50),
                         mcfg, ds, seed=0)
    trainer.train(num_iterations=200)

    img_n = trainer.render(res=(48, 48), shading='normal')
    assert img_n.shape == (48, 48, 3) and np.isfinite(img_n).all()
    # sphere silhouette: center hits (nonzero), corners background (zero)
    assert img_n[24, 24].sum() > 0
    assert img_n[0, 0].sum() == 0

    tex = np.broadcast_to(np.asarray([0.2, 0.6, 0.9], np.float32),
                          (8, 8, 3)).copy()
    img_m = trainer.render(res=(48, 48), shading='matcap', matcap=tex)
    assert np.isfinite(img_m).all()
    np.testing.assert_allclose(img_m[24, 24], [0.2, 0.6, 0.9], atol=1e-4)

    img_s = trainer.render(res=(48, 48), shading='shadow', min_y=-0.9)
    assert np.isfinite(img_s).all()
    # ground plane fills previously-background corners
    assert img_s[0, 0].sum() > 0 or img_s[47, 47].sum() > 0


def test_octree_narrowband_dataset():
    """from_octree_narrowband: all pool samples lie in occupied octree cells,
    rand samples respect per-voxel counts, resample() subsamples the pool."""
    from shacira_tpu.datasets import sdf as sdf_ds
    from shacira_tpu.ops import spc as spc_ops
    v = np.asarray([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                    for z in (-.5, .5)], np.float32)
    f = np.asarray([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    level = 4
    ds = sdf_ds.from_octree_narrowband(
        (v, f), level=level, samples_per_voxel=8, num_samples=512,
        batch_size=128, seed=0)
    # pool is narrowband: every sample's cell is occupied at the level
    # (normalize_mesh rescales the cube, so rebuild the octree identically)
    verts = __import__('shacira_tpu.ops.mesh', fromlist=['x']).normalize_mesh(v)
    rng = np.random.RandomState(0)
    surf = __import__('shacira_tpu.ops.mesh', fromlist=['x']).sample_surface(
        rng, verts, f, max(20000, 8 ** level))
    octree = spc_ops.Octree.from_pointcloud(surf, level)
    occ = octree.occupancy_mask(level)
    cells = spc_ops.quantize_points(ds.pool_coords, level)
    assert occ[cells[:, 0], cells[:, 1], cells[:, 2]].all()
    # narrowband pool is much smaller than an unfiltered uniform pool would be
    assert ds.pool_size > 1000
    # working-set semantics
    assert len(ds.coords) == 512 and ds.pool_size > 512
    before = ds.coords.copy()
    ds.resample()
    assert not np.array_equal(before, ds.coords)
    cb, sb = ds.batch()
    assert cb.shape == (128, 3) and sb.shape == (128, 1)
    # sdf values near zero band (cells touch the surface)
    assert np.percentile(np.abs(ds.pool_sdf), 90) < 0.2
