"""LPIPS(VGG) math tests with random weights (pretrained weights are
bring-your-own in a zero-egress environment — shacira_tpu/ops/lpips.py).

Parity target: wisp/ops/image/metrics.py:81-109 (the reference wraps the
``lpips`` pip package; this is the same computation natively)."""
import numpy as np
import pytest

from shacira_tpu.ops import lpips as L


@pytest.fixture(scope='module')
def weights():
    import jax.numpy as jnp
    return {k: jnp.asarray(v) for k, v in L.random_weights(0).items()}


def test_identity_is_zero(weights):
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    assert L.lpips(img, img, weights=weights) == pytest.approx(0.0, abs=1e-6)


def test_positive_and_symmetric(weights):
    rng = np.random.RandomState(1)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    dab = L.lpips(a, b, weights=weights)
    dba = L.lpips(b, a, weights=weights)
    assert dab > 0
    assert dab == pytest.approx(dba, rel=1e-5)


def test_monotone_in_perturbation(weights):
    """A bigger perturbation of the same image must score farther."""
    rng = np.random.RandomState(2)
    img = rng.uniform(0.2, 0.8, (40, 40, 3)).astype(np.float32)
    noise = rng.randn(40, 40, 3).astype(np.float32)
    d_small = L.lpips(img, np.clip(img + 0.02 * noise, 0, 1), weights=weights)
    d_big = L.lpips(img, np.clip(img + 0.3 * noise, 0, 1), weights=weights)
    assert d_big > d_small > 0


def test_weight_layout_matches_vgg16():
    w = L.random_weights(0)
    assert w['conv0_w'].shape == (3, 3, 3, 64)
    assert w['conv12_w'].shape == (3, 3, 512, 512)
    assert w['lin0'].shape == (64,)
    assert w['lin4'].shape == (512,)
    # 13 convs total in VGG16 features
    assert sum(1 for k in w if k.endswith('_w')) == 13


def test_missing_weights_error_is_actionable(monkeypatch):
    monkeypatch.delenv(L.ENV_VAR, raising=False)
    with pytest.raises(RuntimeError, match='LPIPS weights not found'):
        L.load_lpips_weights(None)


def test_npz_roundtrip(tmp_path, weights):
    path = str(tmp_path / 'lpips_vgg.npz')
    np.savez(path, **{k: np.asarray(v) for k, v in weights.items()})
    loaded = L.load_lpips_weights(path)
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    assert L.lpips(a, b, weights=loaded) == pytest.approx(
        L.lpips(a, b, weights=weights), rel=1e-5)


def test_convert_script_mode_b(tmp_path):
    """tools/convert_lpips.py mode B: torch VGG16 + lin checkpoints -> .npz
    in the exact layout load_lpips_weights expects."""
    torch = pytest.importorskip('torch')
    import sys
    sys.path.insert(0, 'tools')
    import convert_lpips

    rng = np.random.RandomState(0)
    # torchvision VGG16 conv layer indices within `features`
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg, cin = {}, 3
    for i, c in zip(conv_ids, widths):
        vgg[f'features.{i}.weight'] = torch.tensor(
            rng.randn(c, cin, 3, 3).astype(np.float32))
        vgg[f'features.{i}.bias'] = torch.zeros(c)
        cin = c
    lin = {f'lin{li}.model.1.weight': torch.tensor(
               rng.uniform(0, 1, (c, 1, 1, 1)).astype(np.float32))
           for li, c in enumerate([64, 128, 256, 512, 512])}
    vp, lp = tmp_path / 'vgg16.pth', tmp_path / 'lin.pth'
    torch.save(vgg, vp)
    torch.save(lin, lp)
    out = tmp_path / 'w.npz'
    convert_lpips.main(['--out', str(out), '--vgg16-pth', str(vp),
                        '--lin-pth', str(lp)])
    w = L.load_lpips_weights(str(out))
    assert w['conv0_w'].shape == (3, 3, 3, 64)
    assert w['lin4'].shape == (512,)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    assert L.lpips(img, 1.0 - img, weights=w) > 0.0
