"""Remaining parity components: sdf_tex, conditioners, processing ops,
transforms, framework state, differential ops, total variation."""
import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.models.grids.latent_grid import LatentGridConfig


def _grid3():
    return LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=0, multiscale_type='cat', resolution_dim=3,
        feature_std=0.1, codebook_bitwidth=6, init_grid='normal')


def test_neural_sdf_tex():
    from shacira_tpu.models.nefs.sdf_tex import (
        NeuralSDFTexConfig, neural_sdf_tex_init, neural_sdf_tex)
    cfg = NeuralSDFTexConfig(grid=_grid3(), hidden_dim=16, num_layers=1)
    params = neural_sdf_tex_init(jax.random.PRNGKey(0), cfg)
    sdf, rgb = neural_sdf_tex(params, cfg, jnp.zeros((5, 3)))
    assert sdf.shape == (5, 1) and rgb.shape == (5, 3)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1


def test_film_conditioner():
    from shacira_tpu.models.conditioners import FiLMConfig, film_init, film_apply
    cfg = FiLMConfig(cond_dim=4, feature_dim=8)
    params = film_init(jax.random.PRNGKey(0), cfg)
    out = film_apply(params, cfg, jnp.ones((3, 8)), jnp.ones((3, 4)))
    assert out.shape == (3, 8)


def test_srgb_roundtrip_and_mip():
    from shacira_tpu.ops.image_processing import (
        linear_to_srgb, srgb_to_linear, resize_mip)
    x = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)
    y = resize_mip(x, 2)
    assert y.shape == (2, 2, 3)
    np.testing.assert_allclose(y.mean(), x.mean(), atol=1e-6)


def test_rgbd_to_pointcloud():
    from shacira_tpu.ops.image_processing import rgbd_to_pointcloud
    ro = np.zeros((4, 3), np.float32)
    rd = np.tile(np.asarray([0, 0, 1.0], np.float32), (4, 1))
    depth = np.asarray([1.0, 2.0, 0.0, np.inf], np.float32)
    rgb = np.ones((4, 3), np.float32)
    pts, cols = rgbd_to_pointcloud(rgb, depth, ro, rd)
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(pts[:, 2], [1.0, 2.0])


def test_object_transform():
    from shacira_tpu.core.transforms import ObjectTransform
    t = ObjectTransform().scale(2.0).translate([1, 0, 0])
    p = t.apply_points(np.asarray([[1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(p, [[3.0, 2.0, 2.0]])
    back = t.inverse().apply_points(p)
    np.testing.assert_allclose(back, [[1, 1, 1.0]], atol=1e-6)
    o, d = t.apply_rays(np.zeros((1, 3)), np.asarray([[0, 0, 1.0]]))
    np.testing.assert_allclose(d, [[0, 0, 2.0]])  # dirs scale, don't translate


def test_framework_state_watch():
    from shacira_tpu.framework.state import WispState
    state = WispState()
    seen = []
    state.optimization.watch('epoch', lambda o, n, v: seen.append(v))
    state.optimization.epoch = 5
    state.optimization.epoch = 6
    assert seen == [5, 6]
    state.optimization.log(rgb_loss=0.5, psnr=30.0)
    assert state.optimization.losses['rgb_loss'] == [0.5]
    assert state.optimization.metrics['psnr'] == [30.0]
    state.graph.add('obj', object())
    assert 'obj' in state.graph.objects


def test_differential_gradients_agree():
    from shacira_tpu.ops.differential import (
        autodiff_gradient, finitediff_gradient, tetrahedron_gradient)

    def f(x):  # smooth scalar field, [N,3] -> [N,1]
        return jnp.sum(x ** 2, axis=-1, keepdims=True)

    pts = jnp.asarray(np.random.RandomState(0).randn(5, 3) * 0.3, jnp.float32)
    g_auto = autodiff_gradient(f, pts)
    g_fd = finitediff_gradient(f, pts)
    g_tet = tetrahedron_gradient(f, pts)
    np.testing.assert_allclose(np.asarray(g_fd), np.asarray(g_auto),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_tet), np.asarray(g_auto),
                               rtol=1e-2, atol=1e-3)


def test_total_variation():
    from shacira_tpu.ops import spc
    from shacira_tpu.models.grids import octree_grid as og
    cfg = og.OctreeGridConfig(feature_dim=2, base_lod=2, num_lods=1,
                              feature_bias=1.0)
    structure = og.OctreeStructure.make_dense(cfg)
    params = og.octree_grid_init(jax.random.PRNGKey(0), cfg, structure)
    tv = spc.total_variation(params['features'][0], structure.trinkets[2])
    np.testing.assert_allclose(float(tv), 0.0, atol=1e-8)  # constant field
