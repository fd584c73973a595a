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
    # normalized cameras live on a ~radius-2 sphere around the scene
    r = np.linalg.norm(train.rays_o[:, 0], axis=-1)
    assert (r > 1.0).all() and (r < 3.5).all(), r
    d = np.linalg.norm(train.rays_d, axis=-1)
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    # white-bg compositing: background pixels (alpha 0) are white
    bg = ~train.masks[..., 0]
    assert bg.any()
    np.testing.assert_allclose(train.rgb[bg], 1.0, atol=1e-6)
