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

_ACTIVATIONS = {
    'none': lambda x: x,
    'relu': jax.nn.relu,
    'sigmoid': jax.nn.sigmoid,
    'tanh': jnp.tanh,
    'sin': jnp.sin,
    'sine': lambda x: jnp.sin(30.0 * x),
    'lrelu': lambda x: jax.nn.leaky_relu(x, 0.01),
    'softplus': jax.nn.softplus,
}


def get_activation(name: str):
    return _ACTIVATIONS[name]


@dataclass(frozen=True)
class MLPConfig:
    input_dim: int
    output_dim: int
    hidden_dim: int = 128
    num_layers: int = 1            # hidden layers (ref: num_layers)
    activation: str = 'relu'
    bias: bool = True
    skip: Tuple[int, ...] = ()

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


def mlp_init(rng, cfg: MLPConfig):
    dims = cfg.layer_dims()
    keys = jax.random.split(rng, len(dims))
    return {'layers': [_torch_linear_init(k, din, dout, cfg.bias)
                       for k, (din, dout) in zip(keys, dims)]}


def mlp_apply(params, cfg: MLPConfig, x):
    act = get_activation(cfg.activation)
    layers = params['layers']
    h = x
    for i, layer in enumerate(layers[:-1]):
        if i in cfg.skip and i > 0:
            h = jnp.concatenate([x, h], axis=-1)
        h = h @ layer['w']
        if 'b' in layer:
            h = h + layer['b']
        h = act(h)
    out = h @ layers[-1]['w']
    if 'b' in layers[-1]:
        out = out + layers[-1]['b']
    return out


def mlp_size_bits(params) -> int:
    total = 0
    for layer in params['layers']:
        for v in layer.values():
            total += int(np.prod(v.shape)) * np.finfo(np.dtype(v.dtype)).bits
    return total
