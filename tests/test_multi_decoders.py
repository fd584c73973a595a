"""Multi / hierarchical latent decoders + grid integration."""
import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.models.latent_decoders import (
    MultiLatentDecoderConfig, multi_latent_decoder_init,
    multi_latent_decoder_apply, multi_latent_decoder_size_bits, ste_one_hot,
    LatentDecoderConfig, HierarchicalLatentDecoderConfig,
    hierarchical_latent_decoder_init, hierarchical_latent_decoder_apply,
    latent_decoder_apply,
)
from shacira_tpu.models.grids.latent_grid import (
    LatentGridConfig, latent_grid_init, decode_codebook, grid_size_bits,
    interpolate,
)
import pytest


def test_ste_one_hot():
    alpha = jnp.asarray([[0.2, 0.9], [0.8, 0.1]])
    hard = ste_one_hot(alpha)
    np.testing.assert_allclose(np.asarray(hard), [[0., 1.], [1., 0.]])
    g = jax.grad(lambda a: jnp.sum(ste_one_hot(a) * jnp.asarray([[1., 2.], [3., 4.]])))(alpha)
    assert np.all(np.isfinite(np.asarray(g)))  # straight-through grads flow


def test_multi_decoder_hard_matches_selected_single():
    """With straight-through on, each entry must use exactly its argmax
    decoder (the reference's post-decay behavior)."""
    cfg = MultiLatentDecoderConfig(latent_dim=2, feature_dim=3, num_entries=16,
                                   num_decoders=2, use_shift=True)
    params = multi_latent_decoder_init(jax.random.PRNGKey(0), cfg)
    w = jnp.asarray(np.random.RandomState(0).randn(16, 2) * 2, jnp.float32)
    out = multi_latent_decoder_apply(params, cfg, w, straight_through=True)

    assign = np.asarray(jnp.argmax(params['alpha'], axis=0))
    wq = np.round(np.asarray(w)) / np.asarray(params['div'])
    for t in range(16):
        k = assign[t]
        want = wq[t] @ np.asarray(params['layers'][0]['scale'][k]) \
            + np.asarray(params['layers'][0]['shift'][k, 0])
        np.testing.assert_allclose(np.asarray(out[t]), want, rtol=1e-4, atol=1e-5)


def test_multi_decoder_size_counts_assignments():
    cfg = MultiLatentDecoderConfig(latent_dim=1, feature_dim=2, num_entries=64,
                                   num_decoders=4)
    params = multi_latent_decoder_init(jax.random.PRNGKey(1), cfg)
    bits = multi_latent_decoder_size_bits(params)
    fp_only = multi_latent_decoder_size_bits(
        {**params, 'alpha': jnp.zeros_like(params['alpha'])})
    assert bits > 0
    assert np.isfinite(bits)
    # uniform-ish assignments must cost more entropy than all-same
    assert bits >= fp_only - 1e-6


def test_hierarchical_decoder_per_lod_slices():
    dec = LatentDecoderConfig(latent_dim=1, feature_dim=2, use_shift=False)
    cfg = HierarchicalLatentDecoderConfig(num_decoders=2, offsets=(0, 4, 10),
                                          decoder=dec)
    params = hierarchical_latent_decoder_init(jax.random.PRNGKey(0), cfg)
    w = jnp.asarray(np.random.RandomState(0).randn(10, 1) * 2, jnp.float32)
    out = hierarchical_latent_decoder_apply(params, cfg, w)
    assert out.shape == (10, 2)
    # each slice must match its own decoder applied standalone
    a = latent_decoder_apply(params['decoders'][0], dec, w[:4])
    b = latent_decoder_apply(params['decoders'][1], dec, w[4:])
    np.testing.assert_allclose(np.asarray(out[:4]), np.asarray(a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[4:]), np.asarray(b), rtol=1e-5)


def _grid_cfg(ldecode_type):
    return LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=5, init_grid='normal',
        num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1), ldecode_type=ldecode_type)


@pytest.mark.slow
def test_grid_with_multi_and_hierarchical_decoders():
    for ltype in ('multi', 'hierarchical'):
        cfg = _grid_cfg(ltype)
        params = latent_grid_init(jax.random.PRNGKey(0), cfg)
        decoded = decode_codebook(params, cfg)
        assert decoded.shape == (cfg.spec.total_size, 2)
        feats = interpolate(params, cfg, jnp.zeros((5, 2)))
        assert feats.shape == (5, 6)
        ldec_bits, latent_bits = grid_size_bits(params, cfg)
        # near-init latents round to 0 -> ~free; decoder fp bits must count
        assert ldec_bits > 0 and latent_bits >= 0
        # end-to-end grads flow to codebook and decoder params (near-init
        # decode is exactly 0, so use a loss with nonzero output cotangent)
        g = jax.grad(lambda p: jnp.sum(
            (interpolate(p, cfg, jnp.full((5, 2), 0.3)) - 1.0) ** 2))(params)
        assert float(jnp.abs(g['codebook']).sum()) > 0


@pytest.mark.slow
def test_grid_with_multi_decoder_trains():
    """Tiny image INR with a MultiLatentDecoder converges."""
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import ImageTrainer, ImageTrainerConfig
    rng = np.random.RandomState(0)
    y, x = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 24), indexing='ij')
    img = np.stack([x, y, 0.5 * (x + y)], -1).astype(np.float32)
    ds = ImageDataset(img, sample_mode='full')
    cfg = _grid_cfg('multi')
    mcfg = NeuralImageConfig(grid=cfg, hidden_dim=8, num_layers=1)
    tcfg = ImageTrainerConfig(epochs=500, log_every=-1, entropy_reg=1e-4,
                              entropy_reg_end=1e-4, chunk_size=250)
    tr = ImageTrainer(tcfg, mcfg, ds, seed=0)
    out = tr.train()
    assert out['PSNR'] > 17, out
