"""Offline renderer, render buffer, experiment logging, checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.render import offline
from shacira_tpu.core.renderbuffer import RenderBuffer
from shacira_tpu.utils.logging import ExperimentLogger
from shacira_tpu.utils import checkpoint
import pytest


def test_lookat_rays_geometry():
    cfg = offline.CameraConfig(width=8, height=6, fov=45)
    ro, rd = offline.lookat_rays([0, 0, -3], [0, 0, 0], cfg)
    assert ro.shape == (48, 3) and rd.shape == (48, 3)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, rtol=1e-5)
    # center ray points roughly at the target
    center = rd.reshape(6, 8, 3)[3, 4]
    assert center[2] > 0.99


def test_render_rays_and_turntable_analytic():
    cfg = offline.CameraConfig(width=16, height=16, fov=40, dist_max=6)

    def trace_fn(rays, key):
        # analytic sphere hit test -> red sphere on white bg
        o, d = rays.origins, rays.dirs
        b = jnp.sum(o * d, -1)
        c = jnp.sum(o * o, -1) - 0.5 ** 2
        hit = (b * b - c) > 0
        rgb = jnp.where(hit[:, None], jnp.asarray([1.0, 0.2, 0.2]), 1.0)
        return {'rgb': rgb, 'hit': hit}

    frames = list(offline.turntable(trace_fn, cfg, num_angles=3, radius=3))
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (16, 16, 3)
        assert f.reshape(-1, 3).min() < 0.5      # sphere visible
        assert f[0, 0, 0] == 1.0                 # corner = background


def test_renderbuffer_blend():
    a = RenderBuffer({'rgb': jnp.ones((4, 3)) * 0.8,
                      'alpha': jnp.ones((4, 1)) * 0.5,
                      'hit': jnp.asarray([True, False, True, False])})
    b = RenderBuffer({'rgb': jnp.zeros((4, 3)),
                      'alpha': jnp.ones((4, 1)),
                      'hit': jnp.asarray([False, False, True, True])})
    out = a.blend(b)
    np.testing.assert_allclose(np.asarray(out.rgb), 0.4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.channels['hit']),
                                  [True, False, True, True])


@pytest.mark.slow
def test_experiment_logger(tmp_path):
    logger = ExperimentLogger(str(tmp_path), 'test')
    logger.scalar('loss', 0.5, 1)
    logger.image('pred', np.zeros((4, 4, 3)), 1)
    logger.record({'psnr': 30.0, 'bpp': 0.5})
    logger.record({'psnr': 31.0, 'bpp': 0.4})
    logger.close()
    files = os.listdir(tmp_path)
    assert any('logs.parquet' in f or 'logs.json' in f for f in files)
    if any('logs.parquet' in f for f in files):
        import pandas as pd
        df = pd.read_parquet(os.path.join(tmp_path, 'logs.parquet'))
        assert len(df) == 2 and 'psnr' in df


def test_checkpoint_roundtrip(tmp_path):
    state = {'params': {'w': jnp.arange(6.0).reshape(2, 3)},
             'step': 7, 'name': 'x'}
    path = str(tmp_path / 'ckpt.pkl')
    checkpoint.save_state(path, state)
    back = checkpoint.load_state(path)
    np.testing.assert_array_equal(back['params']['w'],
                                  np.arange(6.0).reshape(2, 3))
    assert back['step'] == 7 and back['name'] == 'x'


def test_web_viewer_renders_jpeg():
    from shacira_tpu.render.web_viewer import ViewerServer
    from shacira_tpu.render.offline import CameraConfig

    def trace_fn(rays, key):
        o, d = rays.origins, rays.dirs
        b = jnp.sum(o * d, -1)
        c = jnp.sum(o * o, -1) - 0.25
        hit = (b * b - c) > 0
        rgb = jnp.where(hit[:, None], 0.3, 1.0)
        return {'rgb': jnp.broadcast_to(rgb, (rgb.shape[0], 3))}

    v = ViewerServer(trace_fn, CameraConfig(width=16, height=16))
    frame = v.render_frame(0.5, 0.3, 3.0)
    assert frame.shape == (16, 16, 3)
    data = v.render_jpeg(0.5, 0.3, 3.0)
    assert data[:2] == b'\xff\xd8'  # JPEG magic


def test_web_viewer_http_roundtrip():
    import urllib.request
    from shacira_tpu.render.web_viewer import ViewerServer
    from shacira_tpu.render.offline import CameraConfig

    def trace_fn(rays, key):
        return {'rgb': jnp.ones_like(rays.origins)}

    v = ViewerServer(trace_fn, CameraConfig(width=8, height=8), port=18923)
    v.start_background()
    import time
    time.sleep(0.3)
    try:
        html = urllib.request.urlopen('http://127.0.0.1:18923/').read()
        assert b'shacira_tpu viewer' in html
        jpg = urllib.request.urlopen(
            'http://127.0.0.1:18923/render?theta=0&phi=0&radius=3').read()
        assert jpg[:2] == b'\xff\xd8'
        # stat panels (imgui-widget parity): renderer group is built in,
        # custom groups come from stats_fn
        import json
        v.stats_fn = lambda: {'optimization': {'epoch': 3, 'psnr': 21.5}}
        stats = json.loads(urllib.request.urlopen(
            'http://127.0.0.1:18923/stats').read())
        assert stats['optimization']['epoch'] == 3
        assert 'frame_ms' in stats['renderer']
        assert 'resolution' in stats['renderer']
    finally:
        v.shutdown()


def test_web_viewer_quality_layers_and_lookat():
    """New control surface: arbitrary lookat cameras, the reduced-resolution
    quality knob, and server-side data-layer compositing."""
    import urllib.request
    from shacira_tpu.core import colors
    from shacira_tpu.core.primitives import PrimitivesPack
    from shacira_tpu.render.web_viewer import ViewerServer
    from shacira_tpu.render.offline import CameraConfig

    def trace_fn(rays, key):
        return {'rgb': jnp.zeros_like(rays.origins),
                'depth': jnp.full((rays.origins.shape[0], 1), 9.0)}

    pack = PrimitivesPack()
    pack.add_lines([-0.5, 0.0, 0.0], [0.5, 0.0, 0.0], colors.red)
    v = ViewerServer(trace_fn, CameraConfig(width=32, height=32),
                     port=18924, layers={'l': pack})
    plain = v.render_frame_at((0, 0, 3), (0, 0, 0))
    assert plain.shape == (32, 32, 3) and not np.any(plain > 0)
    over = v.render_frame_at((0, 0, 3), (0, 0, 0), with_layers=True)
    assert np.any(over[:, :, 0] > 0.5)
    half = v.render_frame_at((0, 0, 3), (0, 0, 0), scale=0.5)
    assert half.shape == (16, 16, 3)
    # reduced render is upscaled back to full display size in the jpeg
    jpg = v.render_jpeg_at((0, 0, 3), (0, 0, 0), scale=0.5)
    assert jpg[:2] == b'\xff\xd8'
    v.start_background()
    import time
    time.sleep(0.3)
    try:
        jpg = urllib.request.urlopen(
            'http://127.0.0.1:18924/render?ox=0&oy=0&oz=3&tx=0&ty=0&tz=0'
            '&q=0.5&layers=1').read()
        assert jpg[:2] == b'\xff\xd8'
        html = urllib.request.urlopen('http://127.0.0.1:18924/').read()
        assert b'first-person' in html and b'trackball' in html
    finally:
        v.shutdown()


def test_multihost_helpers():
    from shacira_tpu.parallel import multihost
    multihost.initialize()                  # single-process no-op
    mesh = multihost.global_mesh()
    assert mesh.size == 8
    sl = multihost.host_local_batch_slice(64)
    assert sl == slice(0, 64)               # single process loads everything


def test_pipeline_and_decode_once():
    from shacira_tpu.models.pipeline import Pipeline, decode_once
    from shacira_tpu.models.grids.latent_grid import (
        LatentGridConfig, latent_grid_init)
    from shacira_tpu.models.grids import latent_grid as lg
    cfg = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.5, codebook_bitwidth=5, init_grid='normal',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1))
    params = {'grid': latent_grid_init(jax.random.PRNGKey(0), cfg)}
    decoded = decode_once(params, cfg)
    coords = jnp.full((4, 2), 0.25)
    a = lg.interpolate(params['grid'], cfg, coords, decoded=decoded)
    b = lg.interpolate(params['grid'], cfg, coords)       # decodes internally
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    p = Pipeline(nef_fn=lambda prm, c: lg.interpolate(prm['grid'], cfg, c,
                                                      decoded=decoded))
    out = p(params, coords)
    assert out.shape == (4, 6)


@pytest.mark.slow
def test_optimization_app_trains_while_serving():
    """OptimizationApp (ref wisp optimization_app.py:19-108): training runs
    in the background while the HTTP viewer renders live frames against the
    advancing parameters."""
    import urllib.request
    from tests.test_nerf import synthetic_scene
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers.rf_tracer import RFTracerConfig
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)
    from shacira_tpu.render.offline import CameraConfig
    from shacira_tpu.render.optimization_app import OptimizationApp

    data = synthetic_scene(num_views=4, res=16)
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=8, init_grid='normal',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=8, num_layers=1,
                                     blas_level=3)
    tr = MultiviewTrainer(MultiviewTrainerConfig(epochs=5, chunk_size=4,
                                                 prune_every=-1,
                                                 use_sga=False),
                          mcfg, RFTracerConfig(raymarch_type='ray',
                                               num_steps=16),
                          data, num_rays=32, seed=0)
    app = OptimizationApp.from_multiview(
        tr, camera=CameraConfig(width=8, height=8), port=18931)

    frames = {}

    def poll(entry):
        # fetch a live frame mid-training through the HTTP surface
        if entry['iteration'] == 8 and 'mid' not in frames:
            frames['mid'] = urllib.request.urlopen(
                'http://127.0.0.1:18931/render?theta=0&phi=0&radius=3',
                timeout=30).read()

    app.run(num_iterations=16, log_fn=poll)
    assert tr.iteration == 16
    assert frames['mid'][:2] == b'\xff\xd8'   # JPEG rendered mid-training
