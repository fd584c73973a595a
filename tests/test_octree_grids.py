"""Octree utilities + NGLOD/VQAD/Triplanar grid backbones."""
import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.ops import spc
from shacira_tpu.models.grids import octree_grid as og
from shacira_tpu.models.grids import triplanar_grid as tg
import pytest


def test_morton_roundtrip():
    rng = np.random.RandomState(0)
    pts = rng.randint(0, 1024, (1000, 3)).astype(np.uint64)
    codes = spc.morton3d_np(pts)
    back = spc.morton_decode_np(codes)
    np.testing.assert_array_equal(back, pts.astype(np.int64))
    # jnp version agrees
    jcodes = np.asarray(spc.morton3d(jnp.asarray(pts.astype(np.int32))))
    np.testing.assert_array_equal(jcodes.astype(np.uint64), codes)


def test_octree_build_and_query():
    cells = np.asarray([[0, 0, 0], [3, 3, 3], [1, 2, 3]])
    tree = spc.Octree.from_quantized_points(cells, level=2)
    assert tree.num_cells(2) == 3
    assert tree.num_cells(0) == 1
    codes = jnp.asarray(tree.level_codes[2])
    hit = spc.query_cells(codes, jnp.asarray([[0, 0, 0], [1, 2, 3], [2, 2, 2]]))
    assert int(hit[0]) >= 0 and int(hit[1]) >= 0 and int(hit[2]) == -1


def test_dual_and_trinkets_shared_corners():
    cells = np.asarray([[0, 0, 0], [1, 0, 0]])   # adjacent cells share 4 corners
    tree = spc.Octree.from_quantized_points(cells, level=1)
    corners, trinkets = spc.build_dual(tree, 1)
    assert trinkets.shape == (2, 8)
    assert len(corners) == 12                     # 16 - 4 shared
    # corner positions must match cell + offsets
    offs = np.asarray([[(j >> 2) & 1, (j >> 1) & 1, j & 1] for j in range(8)])
    for m in range(2):
        cell = tree.points(1)[m]
        np.testing.assert_array_equal(corners[trinkets[m]], cell + offs)


def test_octree_grid_interpolates_constant_field():
    cfg = og.OctreeGridConfig(feature_dim=2, base_lod=1, num_lods=2,
                              multiscale_type='sum', feature_std=0.0,
                              feature_bias=1.0)
    structure = og.OctreeStructure.make_dense(cfg)
    params = og.octree_grid_init(jax.random.PRNGKey(0), cfg, structure)
    out = og.interpolate(params, cfg, structure, jnp.zeros((5, 3)))
    # constant-1 features at every corner, summed over 2 LODs -> 2.0
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)


def test_octree_grid_zero_outside_sparse_region():
    cfg = og.OctreeGridConfig(feature_dim=1, base_lod=2, num_lods=1,
                              feature_bias=1.0)
    pts = np.asarray([[-0.9, -0.9, -0.9]])
    structure = og.OctreeStructure.from_pointcloud(cfg, pts, dilate=0)
    params = og.octree_grid_init(jax.random.PRNGKey(0), cfg, structure)
    inside = og.interpolate(params, cfg, structure, jnp.asarray([[-0.95, -0.95, -0.95]]))
    outside = og.interpolate(params, cfg, structure, jnp.asarray([[0.9, 0.9, 0.9]]))
    assert float(jnp.abs(inside).sum()) > 0
    np.testing.assert_allclose(np.asarray(outside), 0.0)


def test_octree_grid_gradients_flow():
    cfg = og.OctreeGridConfig(feature_dim=2, base_lod=2, num_lods=2,
                              feature_std=0.1)
    structure = og.OctreeStructure.make_dense(cfg)
    params = og.octree_grid_init(jax.random.PRNGKey(0), cfg, structure)
    g = jax.grad(lambda p: jnp.sum(
        og.interpolate(p, cfg, structure, jnp.full((4, 3), 0.3)) ** 2))(params)
    assert sum(float(jnp.abs(x).sum()) for x in g['features']) > 0


@pytest.mark.slow
def test_codebook_grid_train_eval_and_size():
    cfg = og.CodebookOctreeGridConfig(feature_dim=3, base_lod=2, num_lods=2,
                                      feature_std=0.5, codebook_bitwidth=3)
    structure = og.OctreeStructure.make_dense(cfg)
    params = og.codebook_grid_init(jax.random.PRNGKey(0), cfg, structure)
    coords = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (16, 3)),
                         jnp.float32)
    train_out = og.codebook_interpolate(params, cfg, structure, coords,
                                        training=True)
    eval_out = og.codebook_interpolate(params, cfg, structure, coords,
                                       training=False)
    # straight-through one-hot forward == argmax lookup forward
    np.testing.assert_allclose(np.asarray(train_out), np.asarray(eval_out),
                               rtol=1e-4, atol=1e-5)
    # gradients flow into logits AND dictionary
    g = jax.grad(lambda p: jnp.sum(og.codebook_interpolate(
        p, cfg, structure, coords, training=True) ** 2))(params)
    assert sum(float(jnp.abs(x).sum()) for x in g['logits']) > 0
    assert sum(float(jnp.abs(x).sum()) for x in g['dictionary']) > 0
    _, bits = og.codebook_grid_size_bits(params)
    assert bits > 0


@pytest.mark.slow
def test_triplanar_grid():
    cfg = tg.TriplanarGridConfig(feature_dim=2, base_lod=2, num_lods=3,
                                 multiscale_type='sum', feature_std=0.1)
    params = tg.triplanar_grid_init(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (10, 3)),
                         jnp.float32)
    out = tg.interpolate(params, cfg, coords)
    assert out.shape == (10, 6)
    # 'cat' mode
    cfg2 = tg.TriplanarGridConfig(feature_dim=2, base_lod=2, num_lods=3,
                                  multiscale_type='cat', feature_std=0.1)
    out2 = tg.interpolate(params, cfg2, coords)
    assert out2.shape == (10, 18)
    g = jax.grad(lambda p: jnp.sum(tg.interpolate(p, cfg, coords) ** 2))(params)
    assert float(jnp.abs(g['planes'][0]['xy']).sum()) > 0
    assert tg.grid_size_bits(params) > 0


def test_triplanar_align_corners_exact_at_grid_points():
    """At grid lattice positions the sample must equal the stored value."""
    cfg = tg.TriplanarGridConfig(feature_dim=1, base_lod=1, num_lods=1)
    params = tg.triplanar_grid_init(jax.random.PRNGKey(0), cfg)
    s = 2 ** 1 + 1  # 3x3 planes; corners at -1, 0, 1
    plane = jnp.arange(s * s, dtype=jnp.float32).reshape(s, s, 1)
    params = {'planes': [{'yz': plane, 'xz': plane * 0, 'xy': plane * 0}]}
    out = tg.interpolate(params, cfg, jnp.asarray([[0.0, -1.0, 0.0]]))
    # yz-plane sampled at (y,z)=(-1,0) -> grid point (0,1) -> value 1
    np.testing.assert_allclose(float(out[0, 0]), 1.0, atol=1e-6)
