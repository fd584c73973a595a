"""Latent decoder + entropy model: parity with a torch transcription of the
reference math (basic_latent_decoder.py / bit_estimator.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from shacira_tpu.models.latent_decoders import (
    LatentDecoderConfig, latent_decoder_init, latent_decoder_apply,
    ste_round, sga_quantize, get_dft_matrix, recalibrate_div, scale_norm,
)
from shacira_tpu.models.prob_models import (
    BitEstimatorConfig, bit_estimator_init, bit_estimator_apply, entropy_bits,
)


def test_ste_round_identity_grad():
    x = jnp.asarray([0.2, 0.7, -1.3])
    y, vjp = jax.vjp(ste_round, x)
    np.testing.assert_allclose(np.asarray(y), [0., 1., -1.])
    (g,) = vjp(jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_dft_matrix_matches_reference_formula():
    got = get_dft_matrix(4, 3)
    import math
    want = np.zeros((4, 3))
    for i in range(4):
        for j in range(3):
            v = math.cos(math.pi / 3 * (i + 0.5) * j) / math.sqrt(3)
            want[i, j] = v * (math.sqrt(2) if j > 0 else 1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _torch_decode(latents, scales, shifts, div, activation='none'):
    """Reference DecoderLayer stack in torch (basic_latent_decoder.py:85-90,194)."""
    x = torch.from_numpy(latents) / torch.from_numpy(div)
    for i, (s, sh) in enumerate(zip(scales, shifts)):
        x = x @ torch.from_numpy(s)
        if sh is not None:
            x = x + torch.from_numpy(sh)
        if i < len(scales) - 1 and activation == 'relu':
            x = torch.relu(x)
    return x.numpy()


def test_decode_matches_torch():
    cfg = LatentDecoderConfig(latent_dim=2, feature_dim=4, use_shift=True,
                              num_layers_dec=1, hidden_dim_dec=8, activation='relu')
    params = latent_decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    latents = rng.randn(32, 2).astype(np.float32) * 3
    scales = [np.asarray(l['scale']) for l in params['layers']]
    shifts = [np.asarray(l['shift']) for l in params['layers']]
    div = np.asarray(params['div'])

    got = latent_decoder_apply(params, cfg, jnp.asarray(latents))
    want = _torch_decode(np.round(latents), scales, shifts, div, 'relu')
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sga_converges_to_rounding_at_low_temperature():
    """At very low temperature SGA must pick the nearest integer almost surely."""
    x = jnp.asarray(np.random.RandomState(0).randn(1000) * 2)
    q = sga_quantize(x, 1e-4, jax.random.PRNGKey(1), diff_sampling=True)
    frac_match = np.mean(np.asarray(q) == np.asarray(jnp.round(x)))
    assert frac_match > 0.95


def test_sga_is_differentiable_with_diff_sampling():
    x = jnp.asarray([0.3, 1.7])
    g = jax.grad(lambda v: jnp.sum(
        sga_quantize(v, 0.5, jax.random.PRNGKey(0), diff_sampling=True)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_recalibrate_div():
    params = {'div': jnp.ones((2,)), 'layers': []}
    latents = jnp.asarray([[-3., 0.5], [2., -0.25]])
    p = recalibrate_div(params, latents, 'max')
    np.testing.assert_allclose(np.asarray(p['div']), [3.0, 0.5])
    p = recalibrate_div(params, latents, 'std')
    np.testing.assert_allclose(np.asarray(p['div']),
                               np.asarray(latents).std(axis=0), rtol=1e-5)


def _torch_bitparm(x, h, b, a, final):
    x = torch.from_numpy(x)
    h, b = torch.from_numpy(h), torch.from_numpy(b)
    if final:
        return torch.sigmoid(x * F.softplus(h) + b).numpy()
    a = torch.from_numpy(a)
    x = x * F.softplus(h) + b
    return (x + torch.tanh(x) * torch.tanh(a)).numpy()


@pytest.mark.parametrize('num_layers', [2, 4])
def test_bit_estimator_matches_torch(num_layers):
    cfg = BitEstimatorConfig(channels=3, num_layers=num_layers)
    params = bit_estimator_init(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(0).randn(16, 3).astype(np.float32)
    got = np.asarray(bit_estimator_apply(params, cfg, jnp.asarray(x)))

    t = x
    order = ['f1', 'f2', 'f3'][: max(0, num_layers - 1)]
    for name in order:
        l = params[name]
        t = _torch_bitparm(t, np.asarray(l['h']), np.asarray(l['b']),
                           np.asarray(l['a']), final=False)
    l = params['f4']
    want = _torch_bitparm(t, np.asarray(l['h']), np.asarray(l['b']), None, final=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_entropy_bits_positive_and_reasonable():
    cfg = BitEstimatorConfig(channels=1, num_layers=4)
    params = bit_estimator_init(jax.random.PRNGKey(0), cfg)
    w = jnp.asarray(np.random.RandomState(0).randn(1000, 1) * 2)
    bits = entropy_bits(params, cfg, w)
    assert float(bits) > 0
    # near-init the model is close to a unit logistic; bits/symbol sane
    assert float(bits) / 1000 < 50
