"""Per-step bulk-draw generator selection (utils/rng.py).

The trainers draw two full-codebook random fields per step (rate-loss dither,
ref wisp/models/grids/latent_grid.py:126-131; SGA logistic sample, ref
wisp/models/latent_decoders.py:183-191).  ``rng_impl`` swaps the generator
behind those draws (threefry -> hardware RngBitGenerator) without touching
the checkpointed threefry key stream.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shacira_tpu.utils.rng import step_key


def test_step_key_identity_and_wrap():
    k = jax.random.PRNGKey(3)
    assert step_key(k, 'threefry') is k
    for impl in ('rbg', 'unsafe_rbg'):
        tk = step_key(k, impl)
        # typed key usable by the bulk-draw ops, right distribution
        u = jax.random.uniform(tk, (4096,))
        u = np.asarray(u)
        assert (u >= 0).all() and (u < 1).all()
        assert 0.4 < u.mean() < 0.6
    with pytest.raises(ValueError):
        step_key(k, 'nope')


@pytest.mark.slow
def test_image_trainer_rng_impl_and_noise_cond():
    """unsafe_rbg trains the image path; noise is only refreshed on
    noise_freq boundaries (lax.cond path)."""
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (
        ImageTrainer, ImageTrainerConfig)
    from shacira_tpu.datasets.image import ImageDataset

    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3).astype(np.float32)
    ds = ImageDataset(img, sample_mode='full')
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.02, codebook_bitwidth=4, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=8, num_layers=1)
    cfg = ImageTrainerConfig(epochs=6, chunk_size=3, entropy_reg=1e-4,
                             entropy_reg_end=1e-4, use_sga=True,
                             noise_freq=4, rng_impl='unsafe_rbg',
                             log_every=100)
    tr = ImageTrainer(cfg, mcfg, ds, seed=0)
    n0 = np.asarray(tr.noise)
    assert (n0 == 0).all()
    tr.train()
    n1 = np.asarray(tr.noise)
    # refreshed at least once (iteration 1), in (-0.5, 0.5)
    assert not (n1 == 0).all()
    assert (np.abs(n1) <= 0.5).all()
    assert np.isfinite(tr.history[-1]['rgb_loss'])


@pytest.mark.slow
def test_noise_freq_cond_keeps_noise_between_refreshes():
    """With noise_freq=1000 the first chunk refreshes once (iter 1) and the
    noise then stays bit-identical across later steps."""
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (
        ImageTrainer, ImageTrainerConfig)
    from shacira_tpu.datasets.image import ImageDataset

    rng = np.random.RandomState(1)
    img = rng.rand(8, 8, 3).astype(np.float32)
    ds = ImageDataset(img, sample_mode='full')
    grid = LatentGridConfig.from_geometric(
        feature_dim=2, num_lods=2, min_grid_res=4, max_grid_res=8,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.02, codebook_bitwidth=4, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=8, num_layers=1)
    cfg = ImageTrainerConfig(epochs=4, chunk_size=2, entropy_reg=1e-4,
                             entropy_reg_end=1e-4, use_sga=True,
                             noise_freq=1000, log_every=100)
    tr = ImageTrainer(cfg, mcfg, ds, seed=0)
    tr.train(epochs=2)
    n_a = np.asarray(tr.noise)
    tr.train(epochs=2)
    n_b = np.asarray(tr.noise)
    assert not (n_a == 0).all()            # refreshed on iteration 1
    np.testing.assert_array_equal(n_a, n_b)  # never refreshed again
