"""Native EXR codec + RTMV loader end-to-end (generated scene)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from shacira_tpu.ops.exr import read_exr, read_exr_rgba, write_exr

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    chans = {'R': rng.random((5, 7)).astype(np.float32),
             'G': rng.random((5, 7)).astype(np.float32),
             'B': rng.random((5, 7)).astype(np.float32),
             'A': (rng.random((5, 7)) > 0.5).astype(np.float32),
             'Z': (rng.random((5, 7)) * 9).astype(np.float32)}
    path = str(tmp_path / 't.exr')
    write_exr(path, chans)
    back = read_exr(path)
    assert set(back) == set(chans)
    for k in chans:
        np.testing.assert_array_equal(back[k], chans[k])
    rgba = read_exr_rgba(path)
    assert rgba.shape == (5, 7, 5)
    np.testing.assert_array_equal(rgba[..., 0], chans['R'])
    np.testing.assert_array_equal(rgba[..., 3], chans['A'])
    np.testing.assert_array_equal(rgba[..., 4], chans['Z'])   # depth last


def test_exr_rejects_non_exr(tmp_path):
    p = tmp_path / 'x.exr'
    p.write_bytes(b'not an exr file at all')
    with pytest.raises(ValueError):
        read_exr(str(p))


def test_rtmv_scene_loads_and_is_multiview_consistent(tmp_path):
    """Generate an RTMV-format scene (EXR + camera JSONs), load it through
    datasets.rtmv, and check rays/shapes/alpha handling."""
    from tools.make_synthetic_data import write_rtmv_scene
    from shacira_tpu.datasets.rtmv import load_rtmv

    out = str(tmp_path / 'scene')
    write_rtmv_scene(out, views=10, res=32)
    assert len([f for f in os.listdir(out) if f.endswith('.exr')]) == 10
    train = load_rtmv(out, split='train')
    val = load_rtmv(out, split='val')
    assert train.num_views == 7 and val.num_views == 1
    assert train.rgb.shape == (7, 32 * 32, 3)
    assert train.rays_o.shape == (7, 32 * 32, 3)
    # depth-based normalization: scene content maps into the unit cube
    # (cameras end up outside it), and the normalized depth pointcloud of
    # every view lies within +-0.9
    r = np.linalg.norm(train.rays_o[:, 0], axis=-1)
    assert (r > 1.0).all() and (r < 8.0).all(), r
    # every foreground (masked) ray must intersect the unit cube — the
    # depth-pointcloud normalization puts scene content inside [-1, 1]
    for v in range(train.num_views):
        fg = train.masks[v, :, 0]
        o = train.rays_o[v][fg]
        d = train.rays_d[v][fg]
        safe = np.where(np.abs(d) < 1e-9, 1e-9, d)
        t0 = np.max(np.minimum((-1 - o) / safe, (1 - o) / safe), axis=-1)
        t1 = np.min(np.maximum((-1 - o) / safe, (1 - o) / safe), axis=-1)
        assert (t1 > np.maximum(t0, 0)).mean() > 0.99, v
    d = np.linalg.norm(train.rays_d, axis=-1)
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    # white-bg compositing: background pixels (alpha 0) are white
    bg = ~train.masks[..., 0]
    assert bg.any()
    np.testing.assert_allclose(train.rgb[bg], 1.0, atol=1e-6)


def test_rtmv_pointcloud_seeds_occupancy(tmp_path):
    """RTMV depth pointcloud pre-seeds the trainer's occupancy grid (the
    reference builds the octree from it) — raymarching never wastes its
    DDA budget on the empty volume of a captured scene."""
    from tools.make_synthetic_data import write_rtmv_scene
    from shacira_tpu.datasets.rtmv import load_rtmv
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers.rf_tracer import RFTracerConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)
    import jax.numpy as jnp

    out = str(tmp_path / 'scene')
    write_rtmv_scene(out, views=8, res=32)
    data = load_rtmv(out, split='train')
    assert data.pointcloud is not None and data.pointcloud.shape[1] == 3
    assert np.abs(data.pointcloud).max() <= 0.95

    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=8, init_grid='normal',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=8, num_layers=1,
                                     blas_level=5)
    tr = MultiviewTrainer(MultiviewTrainerConfig(epochs=2, chunk_size=4,
                                                 prune_every=-1,
                                                 use_sga=False),
                          mcfg, RFTracerConfig(raymarch_type='voxel',
                                               num_steps=4,
                                               max_intersections=16),
                          data, num_rays=32, seed=0)
    frac = float(np.asarray(jnp.mean(
        tr.occ_state['occ'].astype(jnp.float32))[None])[0])
    assert 0.0 < frac < 0.5, frac          # seeded sparse, not dense
    tr.train(num_iterations=4)             # still trains


def test_rtmv_splits_share_one_frame(tmp_path):
    """Train and val splits must normalize into the SAME coordinate frame:
    surface points reconstructed from VAL depths with the val split's rays
    must coincide with the train split's depth pointcloud."""
    from tools.make_synthetic_data import write_rtmv_scene
    from shacira_tpu.datasets.rtmv import load_rtmv
    from shacira_tpu.ops.exr import read_exr_rgba

    out = str(tmp_path / 'scene')
    write_rtmv_scene(out, views=12, res=32)
    train = load_rtmv(out, split='train')
    val = load_rtmv(out, split='val')
    np.testing.assert_allclose(val.norm_center, train.norm_center)
    assert val.norm_scale == train.norm_scale
    # reconstruct the first val view's surface in the normalized frame
    files = sorted(f for f in os.listdir(out) if f.endswith('.exr'))
    n_train = int(len(files) * 0.7)
    img = read_exr_rgba(os.path.join(out, files[n_train]))
    hit = (img[..., 3] > 0.5).reshape(-1) & (img[..., 4].reshape(-1) > 0)
    t = img[..., 4].reshape(-1)[hit] / val.norm_scale
    pts = val.rays_o[0][hit] + val.rays_d[0][hit] * t[:, None]
    # every val surface point lies near the train pointcloud (same frame)
    sub = train.pointcloud[np.random.RandomState(0).choice(
        len(train.pointcloud), min(4000, len(train.pointcloud)),
        replace=False)]
    d = np.sqrt(((pts[:, None, :] - sub[None, :, :]) ** 2).sum(-1)).min(1)
    assert np.median(d) < 0.05, float(np.median(d))
