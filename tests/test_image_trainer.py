"""End-to-end image INR smoke/convergence tests (tiny, CPU-runnable).

Mirrors the reference test strategy gap (SURVEY §4): quality metrics as
ground truth — a tiny image must converge and the size accounting must be
self-consistent."""
import jax
import numpy as np
import pytest

from shacira_tpu.datasets.image import ImageDataset, pixel_coords, index_to_coords
from shacira_tpu.models.grids.latent_grid import LatentGridConfig
from shacira_tpu.models.latent_decoders import LatentDecoderConfig
from shacira_tpu.models.nefs.image import NeuralImageConfig
from shacira_tpu.trainers.image_trainer import ImageTrainer, ImageTrainerConfig


def tiny_image(h=24, w=32):
    rng = np.random.RandomState(0)
    y, x = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing='ij')
    img = np.stack([0.5 + 0.5 * np.sin(6 * x),
                    0.5 + 0.5 * np.cos(4 * y),
                    0.5 * (x + y)], axis=-1).astype(np.float32)
    return img


def make_model_cfg(compressed=True):
    grid = LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=6, min_grid_res=4, max_grid_res=32,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=7, init_grid='uniform',
        num_prob_layers=2, entropy_enabled=compressed)
    if compressed:
        grid = grid.with_ldec(dict(
            norm='max', ldecode_matrix='sq', use_shift=True,
            ldec_std=0.1, use_sga=True, diff_sampling=True))
    return NeuralImageConfig(grid=grid, hidden_dim=16, num_layers=1)


@pytest.mark.slow
def test_image_inr_converges():
    ds = ImageDataset(tiny_image(), sample_mode='full')
    cfg = ImageTrainerConfig(
        epochs=300, use_sga=True, decay_period=0.9, temperature=0.1,
        norm='max', norm_every=10, entropy_reg=1e-3, entropy_reg_end=1e-4,
        log_every=100)
    trainer = ImageTrainer(cfg, make_model_cfg(), ds, seed=0)
    out = trainer.train()
    assert out['PSNR'] > 20.0, f'PSNR too low: {out}'
    assert out['BPP'] > 0
    assert np.isfinite(out['total_size_kb'])


def test_uncompressed_hashgrid_path():
    """ldec disabled -> plain NGP hash grid, raw fp size accounting."""
    ds = ImageDataset(tiny_image(), sample_mode='full')
    cfg = ImageTrainerConfig(epochs=150, log_every=-1, entropy_reg=0.0)
    trainer = ImageTrainer(cfg, make_model_cfg(compressed=False), ds, seed=0)
    out = trainer.train()
    assert out['PSNR'] > 22.0, f'PSNR too low: {out}'


def test_render_shape_and_range():
    ds = ImageDataset(tiny_image(), sample_mode='full')
    trainer = ImageTrainer(ImageTrainerConfig(epochs=5, log_every=-1),
                           make_model_cfg(), ds, seed=0)
    trainer.train()
    img = trainer.render()
    assert img.shape == (24, 32, 3)
    assert np.all(np.isfinite(img))


def test_dataset_sampling_modes():
    img = tiny_image()
    full = ImageDataset(img, sample_mode='full')
    assert full.static_coords and len(full) == 1
    c, r = full.batch(0)
    assert c.shape == (24 * 32, 2) and r.shape == (24 * 32, 3)

    wrep = ImageDataset(img, num_samples=64, sample_mode='wreplace')
    c, r = wrep.batch(0)
    assert c.shape == (64, 2)
    # coords match the pixel they index
    grid = pixel_coords(24, 32)
    woreplace = ImageDataset(img, num_samples=100, sample_mode='woreplace')
    assert len(woreplace) == (24 * 32 + 99) // 100
    c0, r0 = woreplace.batch(0)
    assert c0.shape[0] == 100


def test_index_to_coords_matches_grid():
    h, w = 8, 10
    grid = pixel_coords(h, w)
    idx = np.arange(h * w)
    np.testing.assert_allclose(index_to_coords(idx, h, w), grid, atol=1e-6)


@pytest.mark.slow
def test_sampled_wreplace_training():
    """'wreplace' mode (pearl giga-image path): batched sampled training
    converges on a tiny image."""
    ds = ImageDataset(tiny_image(), num_samples=256, sample_mode='wreplace')
    assert not ds.static_coords
    cfg = ImageTrainerConfig(epochs=150, log_every=-1, entropy_reg=1e-4,
                             entropy_reg_end=1e-4, chunk_size=100,
                             use_sga=True, temperature=0.1, norm='max')
    trainer = ImageTrainer(cfg, make_model_cfg(), ds, seed=0)
    out = trainer.train()
    assert out['PSNR'] > 14, out
    img = trainer.render(trainer.best_params)
    assert img.shape == (24, 32, 3)


def test_sampled_woreplace_training():
    ds = ImageDataset(tiny_image(), num_samples=200, sample_mode='woreplace')
    cfg = ImageTrainerConfig(epochs=120, log_every=-1, chunk_size=100)
    trainer = ImageTrainer(cfg, make_model_cfg(compressed=False), ds, seed=0)
    out = trainer.train()
    assert out['PSNR'] > 14, out


def test_sampled_chunks_cover_whole_permutation():
    """Regression: with chunk_size < batches-per-epoch, the chunked sampled
    loop must still visit every batch of the epoch permutation (it used to
    restart at batch 0 every chunk, never training the tail pixels)."""
    img = tiny_image()
    ds = ImageDataset(img, num_samples=96, sample_mode='woreplace')
    batches = len(ds)
    assert batches == 8   # 24*32/96
    seen = []
    orig = ds.batch
    ds.batch = lambda i: (seen.append(i), orig(i))[1]
    cfg = ImageTrainerConfig(epochs=2, log_every=-1, entropy_reg=0.0,
                             chunk_size=3, device_sampling=False)
    trainer = ImageTrainer(cfg, make_model_cfg(compressed=False), ds, seed=0)
    trainer.train(finalize=False)
    assert sorted(set(seen)) == list(range(batches)), sorted(set(seen))
    # each batch index seen exactly once per epoch
    assert len(seen) == 2 * batches
    assert seen[:batches] != sorted(seen[:batches]) or True  # order free
    for b in range(batches):
        assert seen.count(b) == 2


def test_device_sampling_matches_host_batches():
    """Device-side sampling (image resident in HBM, indices drawn on device)
    must reproduce the host path's batch contents for 'woreplace': the device
    slice of ``shuffle_idx`` equals ``ds.batch(i)``."""
    ds = ImageDataset(tiny_image(), num_samples=96, sample_mode='woreplace')
    for i in range(3):
        c_host, g_host = ds.batch(i)
        idx = ds.shuffle_idx[i * 96:(i + 1) * 96]
        np.testing.assert_allclose(index_to_coords(idx, 24, 32), c_host,
                                   atol=1e-6)
        np.testing.assert_array_equal(ds.rgb[idx], g_host)


def test_device_sampling_engages_and_converges():
    """Default sampled path draws batches on device (no host presampling)."""
    ds = ImageDataset(tiny_image(), num_samples=200, sample_mode='woreplace')
    cfg = ImageTrainerConfig(epochs=120, log_every=-1, chunk_size=100)
    trainer = ImageTrainer(cfg, make_model_cfg(compressed=False), ds, seed=0)
    out = trainer.train()
    assert hasattr(trainer, '_dev_img'), 'device sampling path not engaged'
    assert out['PSNR'] > 14, out


def test_resample_fires_once_per_epoch():
    """Regression: resample must fire at epoch boundaries only, not once per
    chunk (ref pre_epoch, image_trainer.py:119-121)."""
    img = tiny_image()
    ds = ImageDataset(img, num_samples=96, sample_mode='woreplace')
    calls = []
    orig = ds.resample
    ds.resample = lambda: (calls.append(1), orig())[1]
    cfg = ImageTrainerConfig(epochs=3, log_every=-1, entropy_reg=0.0,
                             chunk_size=3, resample=True, resample_every=1)
    trainer = ImageTrainer(cfg, make_model_cfg(compressed=False), ds, seed=0)
    trainer.train(finalize=False)
    # epochs 2 and 3 start -> exactly 2 resamples (never within a chunk run)
    assert len(calls) == 2, len(calls)


@pytest.mark.slow
def test_device_image_u8_matches_f32():
    """device_image_u8: for an 8-bit-source image the uint8 HBM-resident
    copy dequantizes to the exact f32 values, so training is bit-identical
    to the f32-resident path (same device-side batch draws)."""
    import numpy as np
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (ImageTrainer,
                                                    ImageTrainerConfig)
    rng = np.random.RandomState(3)
    img = (rng.randint(0, 256, (32, 48, 3)) / 255.0).astype(np.float32)
    grid = LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, resolution_dim=2, feature_std=1.0,
        codebook_bitwidth=8, num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=8, num_layers=1)

    def run(u8):
        tcfg = ImageTrainerConfig(epochs=4, use_sga=True, temperature=0.5,
                                  entropy_reg=1e-3, entropy_reg_end=1e-4,
                                  log_every=-1, chunk_size=4,
                                  device_image_u8=u8)
        ds = ImageDataset(img, sample_mode='wreplace', num_samples=256)
        tr = ImageTrainer(tcfg, mcfg, ds, seed=0)
        tr.train(finalize=False)
        assert getattr(tr, '_dev_u8', False) == u8
        return np.asarray(tr.params['grid']['codebook'])

    cb_u8 = run(True)
    cb_f32 = run(False)
    np.testing.assert_array_equal(cb_u8, cb_f32)
