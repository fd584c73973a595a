"""CLI apps end-to-end on tiny synthetic data (CPU).

Drives apps/train_image.py exactly as a user would — train, then
--valid-only compressed inference (decode-once + DecoderIdentity swap,
ref main_image.py:591-600) — asserting the artifact files and metrics.
"""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def image_dir(tmp_path):
    from PIL import Image
    d = tmp_path / 'imgs'
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 48),
                             indexing='ij')
        img = np.stack([0.5 + 0.4 * np.sin(5 * xx + i),
                        0.5 + 0.4 * np.cos(4 * yy),
                        xx * yy], -1)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            str(d / f'im{i}.png'))
    return str(d)


def _args(image_dir, log_dir, extra=()):
    return ['--dataset-path', image_dir, '--log-dir', log_dir,
            '--exp-name', 'e2e', '--epochs', '60', '--chunk-size', '30',
            '--num-lods', '4', '--min-grid-res', '4', '--max-grid-res', '16',
            '--codebook-bitwidth', '8', '--feature-dim', '1',
            '--hidden-dim', '8', '--num-layers', '1',
            '--ldecode-enabled', 'True', '--use-sga', 'True',
            '--entropy-reg', '1e-3', '--log-every', '-1'] + list(extra)


@pytest.mark.slow
def test_train_image_app_then_valid_only(image_dir, tmp_path):
    from shacira_tpu.apps import train_image

    log_dir = str(tmp_path / 'runs')
    assert train_image.main(_args(image_dir, log_dir)) == 0
    exp = os.path.join(log_dir, 'e2e')
    listing = os.listdir(exp)
    # per-image dirs + aggregate metrics + completion marker
    assert 'metrics.json' in listing and 'complete' in listing
    with open(os.path.join(exp, 'metrics.json')) as f:
        agg = json.load(f)
    assert agg['average']['num_images'] == 2
    assert np.isfinite(agg['average']['PSNR'])
    trained_psnr = agg['average']['PSNR']

    # --valid-only: loads model_best, decodes the codebook ONCE, re-evaluates
    assert train_image.main(_args(image_dir, log_dir,
                                  ['--valid-only'])) == 0
    with open(os.path.join(exp, 'metrics.json')) as f:
        agg2 = json.load(f)
    # compressed inference reproduces the trained quality
    assert abs(agg2['average']['PSNR'] - trained_psnr) < 0.75, (
        agg2['average']['PSNR'], trained_psnr)


@pytest.mark.slow
def test_train_image_app_pretrained_and_profile(image_dir, tmp_path):
    """--pretrained warm-starts from a saved model; --profile wraps the run
    in a jax.profiler trace (ref base_trainer.py:449 emit_nvtx analog)."""
    from shacira_tpu.apps import train_image

    log_a = str(tmp_path / 'a')
    assert train_image.main(_args(image_dir, log_a)) == 0
    best = os.path.join(log_a, 'e2e', 'im0', 'model_best.ckpt')
    if not os.path.exists(best):
        # per-image subdir layout may differ; find any model_best
        cands = [os.path.join(r, f) for r, _, fs in os.walk(log_a)
                 for f in fs if f == 'model_best.ckpt']
        assert cands, os.listdir(os.path.join(log_a, 'e2e'))
        best = cands[0]

    log_b = str(tmp_path / 'b')
    assert train_image.main(_args(image_dir, log_b,
                                  ['--pretrained', best,
                                   '--profile', '--epochs', '30'])) == 0
    # profile trace directory was produced by jax.profiler
    prof = [os.path.join(r, f) for r, _, fs in os.walk(log_b)
            for f in fs if 'xplane' in f or f.endswith('.trace.json.gz')]
    assert prof, 'no profiler artifacts written'
    with open(os.path.join(log_b, 'e2e', 'metrics.json')) as f:
        agg = json.load(f)
    assert np.isfinite(agg['average']['PSNR'])


@pytest.mark.slow
def test_train_nerf_app_e2e(tmp_path):
    """apps/train_nerf.py end-to-end on a tiny generated Blender scene:
    training, held-out validation, size report, turntable, then
    --valid-only reload."""
    from tools.make_synthetic_data import write_nerf_scene
    from shacira_tpu.apps import train_nerf

    scene = str(tmp_path / 'scene')
    write_nerf_scene(scene, views=6, val_views=2, res=16)
    log_dir = str(tmp_path / 'runs')
    args = ['--dataset-path', scene, '--log-dir', log_dir,
            '--exp-name', 'nerf_e2e', '--epochs', '4', '--chunk-size', '6',
            '--num-lods', '3', '--min-grid-res', '4', '--max-grid-res', '16',
            '--codebook-bitwidth', '8', '--feature-dim', '2',
            '--hidden-dim', '8', '--num-layers', '1', '--blas-level', '3',
            '--num-steps', '32', '--num-rays-sampled-per-img', '64',
            '--ldecode-enabled', 'True', '--entropy-reg', '1e-4',
            '--render-batch', '128', '--log-every', '-1']
    assert train_nerf.main(args) == 0
    exp = os.path.join(log_dir, 'nerf_e2e')
    with open(os.path.join(exp, 'metrics.json')) as f:
        m = json.load(f)
    assert m['split'] == 'val' and np.isfinite(m['psnr'])
    assert m['total_size_kb'] > 0
    for f_ in ('val_view0.png', 'turntable.gif', 'model_best.ckpt',
               'logs.parquet'):
        assert f_ in os.listdir(exp), f_

    # valid-only reload path
    assert train_nerf.main(args + ['--valid-only']) == 0
    with open(os.path.join(exp, 'metrics.json')) as f:
        m2 = json.load(f)
    assert np.isfinite(m2['psnr'])


@pytest.mark.slow
def test_train_nerf_app_octree_backbone(tmp_path):
    """apps/train_nerf.py with --grid-type CodebookOctreeGrid: the full app
    path (config dispatch, structure build, training, validation, size
    report with entropy-coded assignments, turntable) on a tiny scene."""
    from tools.make_synthetic_data import write_nerf_scene
    from shacira_tpu.apps import train_nerf

    scene = str(tmp_path / 'scene')
    write_nerf_scene(scene, views=6, val_views=2, res=16)
    log_dir = str(tmp_path / 'runs')
    args = ['--dataset-path', scene, '--log-dir', log_dir,
            '--exp-name', 'cb_e2e', '--epochs', '4', '--chunk-size', '6',
            '--grid-type', 'CodebookOctreeGrid',
            '--base-lod', '2', '--num-lods', '2',
            '--codebook-bitwidth', '4', '--feature-dim', '2',
            '--feature-std', '0.05', '--multiscale-type', 'sum',
            '--hidden-dim', '8', '--num-layers', '1', '--blas-level', '3',
            '--num-steps', '32', '--num-rays-sampled-per-img', '64',
            '--render-batch', '128', '--log-every', '-1']
    assert train_nerf.main(args) == 0
    exp = os.path.join(log_dir, 'cb_e2e')
    with open(os.path.join(exp, 'metrics.json')) as f:
        m = json.load(f)
    assert m['split'] == 'val' and np.isfinite(m['psnr'])
    assert m['total_size_kb'] > 0 and m['grid_size_kb'] > 0
    assert 'turntable.gif' in os.listdir(exp)
