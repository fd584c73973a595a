"""Size-accounting cross-checks vs the torch reference semantics.

Settles VERDICT r1 weak #8 (DFT basis bits) and item 6 (prob-model
accounting): the reference counts EVERY nn.Parameter in
LatentDecoder.size() — including the frozen DFT basis and the ``div``
vector, both registered as Parameters (basic_latent_decoder.py:54,122,169)
— and its use_prob_model entropy estimate uses the BitEstimator CDF
(latent_grid.py:144-153)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shacira_tpu.models.latent_decoders import (
    LatentDecoderConfig, latent_decoder_init, latent_decoder_size_bits)


@pytest.mark.parametrize('matrix,expected_fields', [
    ('sq', lambda ld, f: ld * f + f + ld),          # scale + shift + div
    ('dft', lambda ld, f: ld * f + f + f + ld),     # dft + scale(1,F) + shift + div
])
def test_latent_decoder_size_bits_matches_torch(matrix, expected_fields):
    """size() == 32 bits x numel of every torch Parameter: for 'dft' the
    fixed basis [ld, F] IS a Parameter (requires_grad=False) and counts
    (basic_latent_decoder.py:54,169); 'div' likewise (:122)."""
    ld, f = 3, 4
    cfg = LatentDecoderConfig(latent_dim=ld, feature_dim=f, norm='max',
                              ldecode_matrix=matrix, use_shift=True,
                              ldec_std=0.1)
    params = latent_decoder_init(jax.random.PRNGKey(0), cfg)
    bits = latent_decoder_size_bits(params)
    assert bits == expected_fields(ld, f) * 32


def test_prob_model_entropy_matches_torch_formula():
    """grid_size_bits(use_prob_model=True) reproduces the reference's
    CDF-difference entropy sum (latent_grid.py:144-153) computed with a
    torch transcription of the BitEstimator."""
    import torch
    from shacira_tpu.models.grids import latent_grid as lg
    from shacira_tpu.models.prob_models import bit_estimator_init

    gcfg = lg.LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=2, resolution_dim=2, feature_std=2.0,
        codebook_bitwidth=6, num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=False,
                     ldec_std=0.1))
    k = jax.random.PRNGKey(1)
    params = jax.tree.map(np.asarray, lg.latent_grid_init(k, gcfg))
    _, bits = lg.grid_size_bits(params, gcfg, use_codec=False,
                                use_prob_model=True)

    # torch transcription of the reference path
    pm = params['prob_model']
    total = 0.0
    cb = params['codebook']
    for c in range(cb.shape[1]):
        w = torch.round(torch.as_tensor(cb[:, c], dtype=torch.float64))
        uniq, counts = torch.unique(w, return_counts=True)

        def torch_cdf(x):
            # mirrors bit_estimator_apply's num_layers gating (ref :58-65)
            x = x.clone()
            nl = gcfg.num_prob_layers
            names = ['f1', 'f2', 'f3'][:max(0, nl - 1)]
            t = lambda arr: torch.as_tensor(np.asarray(arr)[0, c],
                                            dtype=torch.float64)
            for name in names:
                layer = pm[name]
                x = x * torch.nn.functional.softplus(t(layer['h'])) + t(layer['b'])
                x = x + torch.tanh(x) * torch.tanh(t(layer['a']))
            l4 = pm['f4']
            return torch.sigmoid(
                x * torch.nn.functional.softplus(t(l4['h'])) + t(l4['b']))

        probs = torch_cdf(uniq + 0.5) - torch_cdf(uniq - 0.5)
        info = torch.clamp(-torch.log(probs + 1e-10) / np.log(2.0), 0, 1000)
        total += float(torch.sum(info * counts))
    assert abs(bits - total) / max(total, 1.0) < 1e-3, (bits, total)


def test_histogram_vs_prob_model_entropy_ordering():
    """The empirical histogram entropy is the minimum achievable bits; the
    learned-CDF estimate can only be >= it (cross-entropy >= entropy)."""
    from shacira_tpu.models.grids import latent_grid as lg
    gcfg = lg.LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, resolution_dim=2, feature_std=2.0,
        codebook_bitwidth=6, num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=False,
                     ldec_std=0.1))
    params = jax.tree.map(np.asarray,
                          lg.latent_grid_init(jax.random.PRNGKey(2), gcfg))
    _, hist_bits = lg.grid_size_bits(params, gcfg, use_codec=False)
    _, model_bits = lg.grid_size_bits(params, gcfg, use_codec=False,
                                      use_prob_model=True)
    assert model_bits >= hist_bits * 0.999


def test_side_info_accounting():
    """count_side_info: the histogram stream carries its alphabet + 16-bit
    CDF per channel; the prob-model stream carries only the BitEstimator
    params.  Sizes must match the alphabets encode_grid_stream actually
    ships."""
    from shacira_tpu.models.grids import latent_grid as lg
    gcfg = lg.LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=2, resolution_dim=2, feature_std=2.0,
        codebook_bitwidth=6, num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=False,
                     ldec_std=0.1))
    params = jax.tree.map(np.asarray,
                          lg.latent_grid_init(jax.random.PRNGKey(2), gcfg))
    side = lg.stream_side_info_bits(params)
    blob = lg.encode_grid_stream(params, gcfg)
    want = sum(32 + 16 + 32 * len(ch['alphabet'])
               for ch in blob['channels'])
    assert side == want, (side, want)
    pm_bits = lg.prob_model_size_bits(params)
    n_pm = sum(np.prod(l.shape)
               for l in jax.tree.leaves(params['prob_model']))
    assert pm_bits == 32 * n_pm and pm_bits > 0
    _, h0 = lg.grid_size_bits(params, gcfg, use_codec=True)
    _, h1 = lg.grid_size_bits(params, gcfg, use_codec=True,
                              count_side_info=True)
    assert h1 == h0 + side
    _, p0 = lg.grid_size_bits(params, gcfg, use_codec=True,
                              use_prob_model=True)
    _, p1 = lg.grid_size_bits(params, gcfg, use_codec=True,
                              use_prob_model=True, count_side_info=True)
    assert p1 == p0 + pm_bits


@pytest.mark.slow
def test_image_finalize_reports_both_streams():
    """ImageTrainer.finalize(): headline BPP is the prob-model stream
    (+ counted BitEstimator params); the histogram variant with its side
    info is reported alongside."""
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import (ImageTrainer,
                                                    ImageTrainerConfig)
    rng = np.random.RandomState(0)
    img = rng.rand(32, 48, 3).astype(np.float32)
    grid = LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=3, min_grid_res=4, max_grid_res=16,
        latent_dim=1, resolution_dim=2, feature_std=1.0,
        codebook_bitwidth=8, num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=8, num_layers=1)
    tcfg = ImageTrainerConfig(epochs=30, use_sga=True, temperature=0.5,
                              entropy_reg=1e-3, entropy_reg_end=1e-4,
                              log_every=-1, chunk_size=10)
    tr = ImageTrainer(tcfg, mcfg, ImageDataset(img), seed=0)
    out = tr.train()
    for k in ('bpp', 'bpp_hist', 'latent_size_kb', 'latent_size_kb_hist',
              'total_size_kb', 'total_size_kb_hist'):
        assert k in out and out[k] > 0, k
