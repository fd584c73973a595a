"""Small parity components: activations, normalized layers, BitEstimatorN,
SPCField, RandomViewDataset, PerfTimer."""
import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.models import mlp as mlp_mod
from shacira_tpu.models.prob_models import (
    BitEstimatorNConfig, bit_estimator_n_init, bit_estimator_n_apply)
from shacira_tpu.models.nefs.spc_field import SPCField, SPCFieldConfig
from shacira_tpu.datasets.random_view import RandomViewDataset
from shacira_tpu.utils.perf import PerfTimer, named_range


def test_fullsort_minmax():
    x = jnp.asarray([[3.0, 1.0, 2.0, 0.0]])
    np.testing.assert_allclose(np.asarray(mlp_mod.full_sort(x)),
                               [[0, 1, 2, 3.0]])
    mm = np.asarray(mlp_mod.min_max(x))
    np.testing.assert_allclose(mm, [[1, 3, 0, 2.0]])  # pairwise (min,max)


def test_normalized_layers():
    w = jnp.asarray(np.random.RandomState(0).randn(4, 5), jnp.float32)
    wf = mlp_mod.normalize_frobenius(w)
    np.testing.assert_allclose(float(jnp.sqrt(jnp.sum(wf ** 2))), 1.0, rtol=1e-5)
    w1 = mlp_mod.normalize_l1(w)
    assert float(jnp.abs(w1).sum(axis=0).max()) <= 1.0 + 1e-5
    wi = mlp_mod.normalize_linf(w)
    assert float(jnp.abs(wi).sum(axis=1).max()) <= 1.0 + 1e-5
    ws = mlp_mod.spectral_normalize(w)
    s = np.linalg.svd(np.asarray(ws), compute_uv=False)[0]
    np.testing.assert_allclose(s, 1.0, rtol=1e-2)
    # layer_type flows through mlp_apply
    cfg = mlp_mod.MLPConfig(5, 2, hidden_dim=8, num_layers=1,
                            layer_type='frobenius_norm')
    params = mlp_mod.mlp_init(jax.random.PRNGKey(0), cfg)
    out = mlp_mod.mlp_apply(params, cfg, jnp.ones((3, 5)))
    assert out.shape == (3, 2) and np.isfinite(np.asarray(out)).all()


def test_bit_estimator_n_monotone_cdf():
    cfg = BitEstimatorNConfig(channels=2, width=4)
    params = bit_estimator_n_init(jax.random.PRNGKey(0), cfg)
    xs = jnp.linspace(-10, 10, 101)[:, None].repeat(2, 1)
    cdf = np.asarray(bit_estimator_n_apply(params, cfg, xs))
    assert cdf.shape == (101, 2)
    assert np.all(cdf >= 0) and np.all(cdf <= 1)
    assert np.all(np.diff(cdf, axis=0) >= -1e-6)       # monotone
    # single_channel slicing consistent with full
    one = np.asarray(bit_estimator_n_apply(params, cfg, xs[:, 0],
                                           single_channel=0))
    np.testing.assert_allclose(one, cdf[:, 0], rtol=1e-5, atol=1e-6)


def test_spc_field_renders_voxels():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    cols = rng.rand(500, 3).astype(np.float32)
    field = SPCField(SPCFieldConfig(level=4), pts, cols)
    rgb, density = field.rgba(jnp.asarray(pts[:10]))
    assert rgb.shape == (10, 3)
    assert np.all(np.asarray(density) > 0)             # occupied cells
    rgb2, density2 = field.rgba(jnp.asarray([[0.95, 0.95, 0.95]]))
    np.testing.assert_allclose(np.asarray(density2), 0.0)  # empty cell
    assert field.occupancy_mask().sum() > 0


def test_random_view_dataset():
    ds = RandomViewDataset(num_views=3, radius=2.0, seed=1)
    views = list(ds)
    assert len(views) == 3
    for ro, rd, origin in views:
        np.testing.assert_allclose(np.linalg.norm(origin), 2.0, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, rtol=1e-5)


def test_perf_timer():
    t = PerfTimer()
    t.check('a')
    x = jnp.ones((8,)) * 2
    dt = t.check('b', sync_value=x)
    assert dt >= 0
    assert 'b' in t.summary()
    with named_range('scope'):
        _ = jnp.sum(x)


def test_mlp_weight_init_transforms():
    """Weight-init transforms (ref basic_decoders.py:142-192): orthonormal/svd
    give orthogonal matrices, spectral gives unit top singular value,
    identity gives eye."""
    import jax
    import jax.numpy as jnp
    from shacira_tpu.models import mlp as mlp_mod
    key = jax.random.PRNGKey(0)
    for name in ('orthonormal', 'svd', 'spectral', 'identity'):
        cfg = mlp_mod.MLPConfig(input_dim=8, output_dim=4, hidden_dim=16,
                                num_layers=2)
        params = mlp_mod.mlp_init(key, cfg, weight_init=name)
        for layer in params['layers']:
            w = np.asarray(layer['w'])
            assert np.isfinite(w).all()
            if name in ('orthonormal', 'svd'):
                m = w @ w.T if w.shape[0] <= w.shape[1] else w.T @ w
                np.testing.assert_allclose(m, np.eye(m.shape[0]), atol=1e-5)
            elif name == 'spectral':
                s = np.linalg.svd(w, compute_uv=False)
                np.testing.assert_allclose(s.max(), 1.0, atol=1e-5)
            else:
                np.testing.assert_allclose(w, np.eye(*w.shape), atol=0)
    # output still flows
    out = mlp_mod.mlp_apply(params, cfg, jnp.ones((3, 8)))
    assert out.shape == (3, 4)


def test_decay_schedules():
    """Closed-form checks of every schedule shape (semantics of
    wisp/utils/schedulers.py:4-29, vectorized in-house)."""
    from shacira_tpu.core.schedulers import schedule, DecayScheduler
    s = np.arange(0, 130, 10)
    np.testing.assert_allclose(schedule('fix', s, 100, 3.0, 0.0), 3.0)
    lin = schedule('linear', s, 100, 1.0, 0.0)
    np.testing.assert_allclose(lin[:11], 1.0 - s[:11] / 100.0)
    np.testing.assert_allclose(lin[11:], 0.0)          # held at end
    cos = schedule('cosine', s[:11], 100, 1e-3, 1e-4)
    assert cos[0] == 1e-3 and abs(cos[-1] - 1e-4) < 1e-12
    assert np.all(np.diff(cos) < 0)
    # exp: start * T^(s / (total * decay_period)), floored at end
    ex = schedule('exp', s, 100, 1.0, 0.5, temperature=0.1, decay_period=0.6)
    np.testing.assert_allclose(ex[6], max(0.5, 0.1 ** (60 / 60.0)))
    np.testing.assert_allclose(ex[-1], 0.5)
    inv = schedule('inv_sqrt', 100, 100, 2.0, 0.0)
    np.testing.assert_allclose(inv, 2.0 * np.sqrt(0.5))
    # wrapper matches the function pointwise
    sched = DecayScheduler(100, 'exp', 1.0, 0.0,
                           params={'temperature': 0.1, 'decay_period': 0.6})
    np.testing.assert_allclose(sched(30), float(ex[3]) if ex[3] > 0.5
                               else 0.1 ** 0.5, rtol=1e-12)
