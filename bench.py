"""Benchmark: SHACIRA image INR training throughput on one chip.

Trains the kodak-config SHACIRA pipeline (24 LODs, bitwidth 11, SGA +
entropy reg — matching ``app/image/configs/kodak.yaml`` in the reference) on
a full 768x512 image and reports training throughput in megapixels/second
(pixels * steps / time).  Prints ONE JSON line.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
north-star target is >=3x the A100 Wisp reference. We report against a
conservative estimate of the reference's A100 throughput on this config
(~60k epochs over 393k pixels in ~25 min ≈ 16 Mpix/s, from the paper's
training-time ballpark); see BASELINE.md.
"""
import json
import time

import numpy as np

A100_REF_MPIX_S = 16.0


def measure_image():
    import jax
    from shacira_tpu.datasets.image import ImageDataset
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.image import NeuralImageConfig
    from shacira_tpu.trainers.image_trainer import ImageTrainer, ImageTrainerConfig

    h, w = 512, 768  # kodak portrait orientation
    rng = np.random.RandomState(0)
    # procedural test image (zero-egress env): band-limited noise + gradients
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing='ij')
    img = np.stack([
        0.5 + 0.3 * np.sin(20 * xx) * np.cos(13 * yy),
        0.5 + 0.4 * np.cos(17 * (xx + yy)),
        np.clip(xx * 0.6 + 0.2 * np.sin(31 * yy), 0, 1),
    ], axis=-1).astype(np.float32)
    img += rng.randn(h, w, 3).astype(np.float32) * 0.02
    img = np.clip(img, 0, 1)

    ds = ImageDataset(img, sample_mode='full')
    grid = LatentGridConfig.from_geometric(
        feature_dim=1, num_lods=24, min_grid_res=16, max_grid_res=512,
        latent_dim=1, multiscale_type='cat', resolution_dim=2,
        feature_std=0.1, codebook_bitwidth=11, init_grid='uniform',
        num_prob_layers=2, entropy_enabled=True,
    ).with_ldec(dict(norm='max', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralImageConfig(grid=grid, hidden_dim=16, num_layers=1)
    tcfg = ImageTrainerConfig(
        epochs=60000, use_sga=True, decay_period=0.9, temperature=0.1,
        norm='max', norm_every=10, entropy_reg=1e-3, entropy_reg_end=1e-4,
        log_every=-1, chunk_size=200)
    trainer = ImageTrainer(tcfg, mcfg, ds, seed=0)

    def sync():
        # fetch a real value: block_until_ready does not block on the axon
        # relay backend, so force a (1-element) device->host readback
        np.asarray(trainer.params['grid']['codebook'][0:1])

    trainer.train(epochs=200, finalize=False)  # warmup: compiles the scan chunk
    sync()
    n_steps = 1000
    t0 = time.time()
    trainer.train(epochs=n_steps, finalize=False)
    sync()
    dt = time.time() - t0

    mpix_s = (h * w * n_steps) / dt / 1e6
    return {
        'metric': 'image_inr_train_mpix_per_s',
        'value': round(mpix_s, 2),
        'unit': 'Mpix/s',
        'vs_baseline': round(mpix_s / A100_REF_MPIX_S, 3),
    }


def main():
    """Headline: NeRF lego-config training rays/s (paged encode path) — the
    framework's tightest perf target (BASELINE.md: >=3x A100 Wisp).  The
    image-INR throughput rides along in ``extra``."""
    import bench_nerf
    # headline: the reference's actual lego workload (prune/100, adaptive
    # budgets); extra: dense (unpruned, worst-case) rays/s with the tuned
    # march (128-res stage-1 culling, dilation 2, 32K segment budget), and
    # the image-INR path
    # term_tau=11.5: transmittance culling at a ~1e-5 weight cutoff —
    # quality-neutral (tests + CPU convergence check: +0.1 dB)
    nerf = bench_nerf.measure_pruned(coarse_level=7, seg_dilation=2,
                                     seg_budget=32768, term_tau=11.5)
    dense = bench_nerf.measure(paged=True, coarse_level=7, seg_dilation=2,
                               seg_budget=32768)
    voxel = bench_nerf.measure_voxel(paged=True, term_tau=11.5)
    image = measure_image()
    out = dict(nerf)
    out['extra'] = {'dense_rays_per_s': dense['value'],
                    'dense_vs_baseline': dense['vs_baseline'],
                    'voxel_rays_per_s': voxel['value'],
                    'voxel_vs_baseline': voxel['vs_baseline'],
                    'image_mpix_per_s': image['value'],
                    'image_vs_baseline': image['vs_baseline']}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
