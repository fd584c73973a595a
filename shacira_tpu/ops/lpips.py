"""LPIPS(VGG) perceptual metric in JAX.

Parity target: ``wisp/ops/image/metrics.py:81-109`` in the reference, which
wraps the ``lpips`` pip package (``LPIPS(net='vgg')``).  This module
implements the same computation natively:

    x, y in [0,1] HWC  ->  scaled to [-1,1]  ->  LPIPS channel-normalize
    -> VGG16 conv features after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
    -> unit-normalize each feature map across channels
    -> squared difference, 1x1 learned linear layer (non-negative weights)
    -> spatial mean, sum over the 5 layers.

Pretrained VGG16 + LPIPS linear weights cannot be downloaded in a
zero-egress environment, so weights are **bring-your-own**: point
``load_lpips_weights`` at an ``.npz`` produced by :func:`export_weights_npz`
(run it once anywhere torchvision + lpips are installed), or set the
``SHACIRA_LPIPS_WEIGHTS`` environment variable.  The math itself is fully
tested against shape/metric-axiom properties with random weights.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input scaling layer constants (lpips.ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 feature config: conv channel widths per block ('M' = 2x2 maxpool).
_VGG16_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512)
# Indices (into the conv list) after which LPIPS taps features:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_TAP_CONVS = (1, 3, 6, 9, 12)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

ENV_VAR = 'SHACIRA_LPIPS_WEIGHTS'


def random_weights(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random-init weight dict with the exact pretrained layout (testing)."""
    rng = np.random.RandomState(seed)
    w = {}
    cin = 3
    i = 0
    for c in _VGG16_CFG:
        if c == 'M':
            continue
        w[f'conv{i}_w'] = (rng.randn(3, 3, cin, c) / np.sqrt(9 * cin)).astype(np.float32)
        w[f'conv{i}_b'] = np.zeros(c, np.float32)
        cin = c
        i += 1
    for li, c in enumerate(_TAP_CHANNELS):
        w[f'lin{li}'] = rng.uniform(0, 1, (c,)).astype(np.float32)
    return w


def load_lpips_weights(path: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Load an LPIPS-VGG weight ``.npz`` (see :func:`export_weights_npz`).

    Falls back to the ``SHACIRA_LPIPS_WEIGHTS`` env var; raises with install
    instructions when neither is available (mirroring the reference's
    missing-package error, wisp/ops/image/metrics.py:94-97).
    """
    path = path or os.environ.get(ENV_VAR)
    if not path or not os.path.exists(path):
        raise RuntimeError(
            'LPIPS weights not found. Export them once with '
            'shacira_tpu.ops.lpips.export_weights_npz() on a machine with '
            'torchvision+lpips installed, then set '
            f'{ENV_VAR}=/path/to/lpips_vgg.npz')
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def export_weights_npz(out_path: str):  # pragma: no cover - needs downloads
    """Dump pretrained VGG16 + LPIPS linear weights to ``.npz``.

    Run on any machine with ``torchvision`` and ``lpips`` installed:
    torch [out,in,kh,kw] conv kernels are transposed to HWIO.
    """
    import lpips as lpips_pkg  # type: ignore
    model = lpips_pkg.LPIPS(net='vgg')
    w = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
            [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
            [m for m in model.net.slice5]
    i = 0
    for m in convs:
        if m.__class__.__name__ == 'Conv2d':
            w[f'conv{i}_w'] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
            w[f'conv{i}_b'] = m.bias.detach().numpy()
            i += 1
    for li, lin in enumerate(model.lins):
        w[f'lin{li}'] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **w)


def _conv3x3(x, w, b):
    """SAME conv, NHWC x HWIO."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b[None, None, None, :]


def _vgg_taps(weights, x):
    """Run VGG16 features on NHWC x, returning the 5 LPIPS tap activations."""
    taps = []
    i = 0
    for c in _VGG16_CFG:
        if c == 'M':
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
            continue
        x = jax.nn.relu(_conv3x3(x, weights[f'conv{i}_w'], weights[f'conv{i}_b']))
        if i in _TAP_CONVS:
            taps.append(x)
        i += 1
    return taps


def _unit_normalize(f, eps=1e-10):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


@partial(jax.jit, static_argnames=())
def _lpips_impl(weights, x, y):
    sh = jnp.asarray(_SHIFT)[None, None, None, :]
    sc = jnp.asarray(_SCALE)[None, None, None, :]
    fx = _vgg_taps(weights, (x - sh) / sc)
    fy = _vgg_taps(weights, (y - sh) / sc)
    total = 0.0
    for li, (a, b) in enumerate(zip(fx, fy)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2     # [N,H,W,C]
        lin = jnp.maximum(weights[f'lin{li}'], 0.0)            # 1x1 conv, >=0
        total = total + jnp.mean(jnp.sum(d * lin[None, None, None, :], axis=-1),
                                 axis=(1, 2))
    return total                                                # [N]


def lpips(rgb, gts, weights=None) -> float:
    """LPIPS(VGG) between two ``[H, W, 3]`` images in [0, 1].

    Matches the reference entry point (wisp/ops/image/metrics.py:81-109):
    inputs are mapped to [-1, 1] before the network.  ``weights`` defaults to
    :func:`load_lpips_weights` (pretrained, bring-your-own .npz).
    """
    if weights is None:
        weights = load_lpips_weights()
    x = 2.0 * jnp.asarray(rgb, jnp.float32)[None, ..., :3] - 1.0
    y = 2.0 * jnp.asarray(gts, jnp.float32)[None, ..., :3] - 1.0
    return float(np.asarray(_lpips_impl(weights, x, y))[0])
