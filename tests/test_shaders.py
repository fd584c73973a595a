"""Matcap / shadow shader tests (ref wisp/ops/shaders + geometric.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.core.rays import make_rays
from shacira_tpu.render import shaders


def test_spherical_envmap_matches_reference_numpy():
    """Against a literal NumPy transcription of spherical_envmap_numpy
    (wisp/ops/geometric.py:158-178)."""
    rng = np.random.RandomState(0)
    rd = rng.randn(64, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    n = rng.randn(64, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)

    rds = rd * np.array([1, 1, -1])
    dot = np.sum(n * rds, axis=-1)[..., None]
    r = rds - 2.0 * dot * n
    m = 2.0 * np.sqrt(r[..., 0] ** 2 + r[..., 1] ** 2 + (r[..., 2] - 1) ** 2)
    want = 1.0 - (r[..., :2] / m[..., None] + 0.5)
    want = np.clip(want, 0, 1)
    want[np.isnan(want)] = 0

    got = np.asarray(shaders.spherical_envmap(jnp.asarray(rd), jnp.asarray(n)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bilinear_sample_exact_on_grid_points():
    tex = np.arange(24, dtype=np.float32).reshape(4, 3, 2)
    uv = np.asarray([[0.0, 0.0], [1.0, 1.0], [1 / 3, 0.5]], np.float32)
    out = np.asarray(shaders.sample_texture_bilinear(jnp.asarray(tex),
                                                     jnp.asarray(uv)))
    np.testing.assert_allclose(out[0], tex[0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1], tex[3, 2], atol=1e-5)
    np.testing.assert_allclose(out[2], tex[1, 1], atol=1e-5)


def test_matcap_shader_shapes_and_range():
    rng = np.random.RandomState(1)
    n = rng.randn(32, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    rb = {'normal': jnp.asarray(n)}
    o = np.zeros((32, 3), np.float32)
    d = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (32, 1))
    rays = make_rays(o, d, 0.0, 5.0)
    tex = rng.rand(16, 16, 3).astype(np.float32)
    out = shaders.matcap_shader(rb, rays, tex)
    assert out['rgb'].shape == (32, 3)
    assert float(jnp.min(out['rgb'])) >= 0.0
    assert float(jnp.max(out['rgb'])) <= 1.0


def test_shadow_shader_blocks_light():
    """A blocker between the ground plane and the light must darken the
    ground under it; unblocked ground stays bright."""
    h = w = 8
    n = h * w
    o = np.zeros((n, 3), np.float32)
    o[:, 1] = 2.0                     # camera above, looking down
    d = np.tile(np.asarray([[0, -1.0, 0]], np.float32), (n, 1))
    xs = np.linspace(-1, 1, w)
    o[:, 0] = np.repeat(xs, h)
    rays = make_rays(o, d, 0.0, 10.0)
    rb = {'hit': jnp.zeros((n,), bool), 'depth': jnp.zeros((n, 1)),
          'xyz': jnp.zeros((n, 3)), 'normal': jnp.zeros((n, 3)),
          'rgb': jnp.ones((n, 3))}

    light = [0.0, 5.0, 0.0]

    def trace_hit_fn(sr):
        # occluder: a disc of radius 0.3 at y=1 blocks vertical shadow rays
        t = (1.0 - sr.origins[:, 1]) / jnp.where(
            jnp.abs(sr.dirs[:, 1]) < 1e-6, 1e-6, sr.dirs[:, 1])
        p = sr.origins + sr.dirs * t[:, None]
        return (t > 0) & (p[:, 0] ** 2 + p[:, 2] ** 2 < 0.3 ** 2)

    out = shaders.shadow_shader(rb, rays, trace_hit_fn, light, min_y=0.0,
                                image_shape=(h, w))
    rgbs = np.asarray(out['rgb']).reshape(w, h, 3)
    assert np.asarray(out['hit']).all()            # everything hits ground
    center = rgbs[w // 2, h // 2].mean()
    edge = rgbs[0, 0].mean()
    assert center < edge, (center, edge)           # shadow under the disc
