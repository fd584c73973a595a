"""Basic MLP decode head.

Functional equivalent of ``wisp/models/decoders/basic_decoders.py:17-139``
(reference BasicDecoder): ``num_layers`` hidden layers + one output layer,
optional skip connections.  Initialization follows torch's default
``nn.Linear`` (Kaiming-uniform weights, fan-in uniform bias) so convergence
behaviour matches the reference.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

def full_sort(x):
    """"FullSort" activation (ref basic_activations.py:12-24): sorts the
    feature dimension (norm-preserving nonlinearity)."""
    return jnp.sort(x, axis=-1)


def min_max(x):
    """"MinMax" activation (ref :26-42): pairwise partial sort; feature dim
    must be even."""
    shape = x.shape
    x2 = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    lo = jnp.min(x2, axis=-1, keepdims=True)
    hi = jnp.max(x2, axis=-1, keepdims=True)
    return jnp.concatenate([lo, hi], axis=-1).reshape(shape)


_ACTIVATIONS = {
    'none': lambda x: x,
    'identity': lambda x: x,
    'relu': jax.nn.relu,
    'sigmoid': jax.nn.sigmoid,
    'tanh': jnp.tanh,
    'sin': jnp.sin,
    'sine': lambda x: jnp.sin(30.0 * x),
    'sinescaled': lambda x: jnp.sin(30.0 * x),
    'fullsort': full_sort,
    'minmax': min_max,
    'lrelu': lambda x: jax.nn.leaky_relu(x, 0.01),
    'softplus': jax.nn.softplus,
}


def get_activation(name: str):
    return _ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# Normalized linear layer variants (ref wisp/models/layers.py:13-109):
# weight normalization applied in the forward pass.
# ---------------------------------------------------------------------------

def normalize_frobenius(w):
    return w / jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))


def normalize_l1(w):
    """Scale columns so absolute column sums are <= 1 (ref normalize_L_1)."""
    abscolsum = jnp.sum(jnp.abs(w), axis=0)
    scale = jnp.minimum(1.0 / abscolsum, 1.0)
    return w * scale[None, :]


def normalize_linf(w):
    """Scale rows so absolute row sums are <= 1 (ref normalize_L_inf)."""
    absrowsum = jnp.sum(jnp.abs(w), axis=1)
    scale = jnp.minimum(1.0 / absrowsum, 1.0)
    return w * scale[:, None]


def spectral_normalize(w, iters: int = 8):
    """Power-iteration spectral norm (ref uses torch spectral_norm)."""
    v = jnp.ones((w.shape[1],)) / np.sqrt(w.shape[1])
    for _ in range(iters):
        u = w @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
    sigma = u @ w @ v
    return w / (sigma + 1e-12)


_LAYER_NORMALIZERS = {
    'none': None,
    'linear': None,
    'frobenius_norm': normalize_frobenius,
    'l_1_norm': normalize_l1,
    'l_inf_norm': normalize_linf,
    'spectral_norm': spectral_normalize,
}


@dataclass(frozen=True)
class MLPConfig:
    input_dim: int
    output_dim: int
    hidden_dim: int = 128
    num_layers: int = 1            # hidden layers (ref: num_layers)
    activation: str = 'relu'
    bias: bool = True
    skip: Tuple[int, ...] = ()
    layer_type: str = 'none'       # 'none'|'frobenius_norm'|'l_1_norm'|...

    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        dims = []
        for i in range(self.num_layers):
            if i == 0:
                dims.append((self.input_dim, self.hidden_dim))
            elif i in self.skip:
                dims.append((self.hidden_dim + self.input_dim, self.hidden_dim))
            else:
                dims.append((self.hidden_dim, self.hidden_dim))
        dims.append((self.hidden_dim, self.output_dim))
        return tuple(dims)


def _torch_linear_init(key, din, dout, bias):
    """torch.nn.Linear default init: W ~ U(-k, k), b ~ U(-k, k), k=1/sqrt(din)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(din)
    w = jax.random.uniform(kw, (din, dout), minval=-bound, maxval=bound)
    p = {'w': w}
    if bias:
        p['b'] = jax.random.uniform(kb, (dout,), minval=-bound, maxval=bound)
    return p


def mlp_init(rng, cfg: MLPConfig, weight_init: str = 'none'):
    """``weight_init``: post-transform applied to each layer's weight after
    the torch-default draw — 'none' | 'orthonormal' | 'svd' | 'spectral' |
    'identity' (ref basic_decoders.py:142-192 initialize() helpers)."""
    dims = cfg.layer_dims()
    keys = jax.random.split(rng, len(dims))
    layers = [_torch_linear_init(k, din, dout, cfg.bias)
              for k, (din, dout) in zip(keys, dims)]
    if weight_init != 'none':
        fn = WEIGHT_INITS[weight_init]
        for i, layer in enumerate(layers):
            layer['w'] = fn(keys[i], layer['w'])
    return {'layers': layers}


# -- weight-init transforms (ref basic_decoders.py:142-192) -----------------

def init_orthonormal(key, w):
    """Random orthonormal matrix of w's shape (ref orthonormal, :142-154)."""
    n = max(w.shape)
    a = jax.random.normal(key, (n, n))
    q, r = jnp.linalg.qr(a)
    # sign-correct so Q is Haar-distributed (scipy ortho_group semantics)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return q[:w.shape[0], :w.shape[1]].astype(w.dtype)


def init_svd(key, w):
    """Replace w with U @ V^T of its SVD — the nearest orthogonal matrix
    (ref svd, :156-166)."""
    u, _, vt = jnp.linalg.svd(w, full_matrices=False)
    return (u @ vt).astype(w.dtype)


def init_spectral(key, w):
    """Scale w to unit spectral norm (ref spectral_normalization, :168-178)."""
    s = jnp.linalg.svd(w, compute_uv=False)
    return (w / s.max()).astype(w.dtype)


def init_identity(key, w):
    """Identity (zero-padded when rectangular; ref identity, :180-192)."""
    return jnp.eye(w.shape[0], w.shape[1], dtype=w.dtype)


WEIGHT_INITS = {
    'orthonormal': init_orthonormal,
    'svd': init_svd,
    'spectral': init_spectral,
    'identity': init_identity,
}


def mlp_apply(params, cfg: MLPConfig, x, compute_dtype=None):
    """``compute_dtype``: optional autocast (e.g. bf16 for the reference's
    AMP path) — weights/activations cast per layer, caller casts back."""
    act = get_activation(cfg.activation)
    normalizer = _LAYER_NORMALIZERS[cfg.layer_type]
    layers = params['layers']
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    def weight(layer):
        w = normalizer(layer['w']) if normalizer is not None else layer['w']
        return w.astype(compute_dtype) if compute_dtype is not None else w

    def bias(layer):
        b = layer['b']
        return b.astype(compute_dtype) if compute_dtype is not None else b

    h = x
    for i, layer in enumerate(layers[:-1]):
        if i in cfg.skip and i > 0:
            h = jnp.concatenate([x, h], axis=-1)
        h = h @ weight(layer)
        if 'b' in layer:
            h = h + bias(layer)
        h = act(h)
    out = h @ weight(layers[-1])
    if 'b' in layers[-1]:
        out = out + bias(layers[-1])
    return out


def mlp_size_bits(params) -> int:
    total = 0
    for layer in params['layers']:
        for v in layer.values():
            total += int(np.prod(v.shape)) * np.finfo(np.dtype(v.dtype)).bits
    return total
