"""SHACIRA latent decoders: quantize latents + decode to features.

TPU-native functional re-design of
``wisp/models/latent_decoders/basic_latent_decoder.py`` (reference):
parameters are explicit pytrees, quantization noise is driven by explicit JAX
PRNG keys, and runtime switches (SGA on/off, temperature) are traced scalars /
static args instead of module attributes — so one jitted train step covers the
whole schedule.

Math parity with the reference:
  * STE round: ``StraightThrough`` (basic_latent_decoder.py:28-36).
  * SGA (stochastic Gumbel annealing): floor/ceil logits
    ``-tanh(clamp(w - floor(w)))/T`` fed to a relaxed one-hot categorical with
    the same temperature (basic_latent_decoder.py:183-191).
  * Decode: ``layers(round(w) / div)`` where each layer is
    ``x @ scale + shift`` or the DFT variant ``(x @ dft) * scale + shift``
    (DecoderLayer, basic_latent_decoder.py:48-95), followed by the final
    activation and optional clamp (basic_latent_decoder.py:194-198).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-6


def get_dft_matrix(conv_dim: int, channels: int) -> np.ndarray:
    """DCT-II basis, identical to get_dft_matrix (basic_latent_decoder.py:12-19)."""
    dft = np.zeros((conv_dim, channels), dtype=np.float32)
    for i in range(conv_dim):
        for j in range(channels):
            v = math.cos(math.pi / channels * (i + 0.5) * j) / math.sqrt(channels)
            dft[i, j] = v * (math.sqrt(2) if j > 0 else 1.0)
    return dft


def ste_round(x):
    """Round with identity gradient (StraightThrough, ref :28-36)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def ste_floor(x):
    """Floor with identity gradient (StraightThroughFloor, ref :38-46)."""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def sga_quantize(x, temperature, rng, diff_sampling: bool):
    """Stochastic Gumbel annealing quantization (ref :183-191).

    ``floor``/``ceil`` logits are ``-tanh(clamp(dist))/T``; a relaxed one-hot
    categorical with the same temperature mixes the two integers.  With
    ``diff_sampling`` the sample is reparameterized (rsample), else gradients
    flow only through the straight-through floor.

    Implementation note: for two categories the relaxed softmax collapses
    exactly — ``softmax((l + g)/T)[1] = sigmoid(((l_c - l_f) + Δg)/T)`` with
    ``Δg = g_c - g_f ~ Logistic(0, 1)``, and the mix ``xf·s0 + xc·s1``
    equals ``xf + s1``.  Identical distribution and reparameterized
    gradients at half the elementwise/RNG cost (this runs over the full
    latent table every step).
    """
    xf = jnp.floor(x) if diff_sampling else ste_floor(x)
    # logits_c - logits_f; distances clamped like the reference's clamp
    dl = (jnp.tanh(jnp.clip(x - xf, -1 + EPSILON, 1 - EPSILON))
          - jnp.tanh(jnp.clip(xf + 1.0 - x, -1 + EPSILON, 1 - EPSILON)))
    u = jax.random.uniform(rng, x.shape, dtype=x.dtype,
                           minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
    dg = jnp.log(u) - jnp.log1p(-u)          # Gumbel difference = Logistic
    s1 = jax.nn.sigmoid((dl / temperature + dg) / temperature)
    if not diff_sampling:
        s1 = jax.lax.stop_gradient(s1)
    return xf + s1


_ACTIVATIONS = {
    'none': lambda x: x,
    'sigmoid': jax.nn.sigmoid,
    'tanh': jnp.tanh,
    'relu': jax.nn.relu,
    'sine': lambda x: jnp.sin(30.0 * x),  # SineScaled(30), ref :131
}


@dataclass(frozen=True)
class LatentDecoderConfig:
    """Static configuration for :func:`latent_decoder_init` / ``apply``."""
    latent_dim: int
    feature_dim: int
    norm: str = 'none'                # 'none' | 'max' | 'std' (recalibration target)
    ldecode_matrix: str = 'sq'        # 'sq' | 'dft' | 'dft_fixed'
    use_shift: bool = True
    num_layers_dec: int = 0
    hidden_dim_dec: int = 0
    activation: str = 'none'
    final_activation: str = 'none'
    clamp_weights: float = 0.0
    ldec_std: float = 1.0
    use_sga: bool = False
    diff_sampling: bool = False

    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        """(in, out) per DecoderLayer, mirroring ref :137-145."""
        dims = []
        latent = self.latent_dim
        hidden = self.hidden_dim_dec if self.hidden_dim_dec else self.feature_dim
        for _ in range(self.num_layers_dec):
            out = hidden if hidden else latent
            dims.append((latent, out))
            latent = out
        dims.append((latent, self.feature_dim))
        return tuple(dims)


def latent_decoder_init(rng, cfg: LatentDecoderConfig):
    """Initialize parameters.

    Returns a dict:
      ``layers``: list of per-layer dicts with ``scale`` (+ ``dft`` buffer for
      DFT variants, + ``shift`` when ``use_shift``).
      ``div``: [latent_dim] norm divisor (non-trainable; recalibrated by the
      trainer, ref image_trainer.py:284-296).
    """
    layers = []
    keys = jax.random.split(rng, len(cfg.layer_dims()))
    for k, (din, dout) in zip(keys, cfg.layer_dims()):
        layer = {}
        if 'dft' in cfg.ldecode_matrix:
            layer['dft'] = jnp.asarray(get_dft_matrix(din, dout))
            layer['scale'] = jax.random.normal(k, (1, dout)) * cfg.ldec_std
        else:
            layer['scale'] = jax.random.normal(k, (din, dout)) * cfg.ldec_std
        if cfg.use_shift:
            layer['shift'] = jnp.zeros((1, dout))
        layers.append(layer)
    return {'layers': layers, 'div': jnp.ones((cfg.latent_dim,))}


def _decoder_layers_apply(params, cfg: LatentDecoderConfig, x):
    act = _ACTIVATIONS[cfg.activation]
    n = len(params['layers'])
    for i, layer in enumerate(params['layers']):
        if 'dft' in cfg.ldecode_matrix:
            x = jnp.matmul(x, layer['dft']) * layer['scale']
        else:
            x = jnp.matmul(x, layer['scale'])
        if 'shift' in layer:
            x = x + layer['shift']
        if i < n - 1:
            x = act(x)
    return x


def latent_decoder_apply(params, cfg: LatentDecoderConfig, weight, *,
                         use_sga: bool = False,
                         temperature: float = 1.0,
                         rng: Optional[jax.Array] = None):
    """Quantize + decode latents (ref forward, :182-198).

    Args:
        weight: [T, latent_dim] raw (continuous) latents.
        use_sga: when True (and training), quantize with SGA; else STE round.
        temperature: SGA temperature (traced scalar ok).
        rng: PRNG key, required when ``use_sga``.
    Returns:
        [T, feature_dim] decoded features.
    """
    if use_sga:
        assert rng is not None, 'SGA quantization requires a PRNG key'
        w = sga_quantize(weight, temperature, rng, cfg.diff_sampling)
    else:
        w = ste_round(weight)
    out = _decoder_layers_apply(params, cfg, w / params['div'])
    out = _ACTIVATIONS[cfg.final_activation](out)
    if cfg.clamp_weights > 0.0:
        out = jnp.clip(out, -cfg.clamp_weights, cfg.clamp_weights)
    return out


def latent_decoder_is_affine(cfg: LatentDecoderConfig) -> bool:
    """True when decode is a single affine map (quantize -> /div -> one
    matmul + shift) — the default SHACIRA configuration.  Such decoders fuse
    into the hash-encode VJP (ops/hashgrid.hash_encode_affine)."""
    return (cfg.num_layers_dec == 0 and cfg.final_activation == 'none'
            and cfg.clamp_weights == 0.0)


def latent_decoder_affine_parts(params, cfg: LatentDecoderConfig, weight, *,
                                use_sga: bool = False, temperature: float = 1.0,
                                rng: Optional[jax.Array] = None):
    """(z, matrix, shift) with decode(weight) == z @ matrix + shift.

    z is the quantized+normalized latent table; for the DFT variant the
    effective matrix is ``dft * scale`` (row-broadcast).
    """
    assert latent_decoder_is_affine(cfg)
    if use_sga:
        assert rng is not None
        w = sga_quantize(weight, temperature, rng, cfg.diff_sampling)
    else:
        w = ste_round(weight)
    z = w / params['div']
    layer = params['layers'][0]
    if 'dft' in cfg.ldecode_matrix:
        matrix = layer['dft'] * layer['scale']
    else:
        matrix = layer['scale']
    shift = layer.get('shift')
    if shift is None:
        shift = jnp.zeros((1, matrix.shape[1]), matrix.dtype)
    return z, matrix, shift


def latent_decoder_size_bits(params) -> int:
    """fp bits of decoder params (ref size(), :167-168). Excludes buffers? No:
    the reference counts every parameter incl. the frozen ``div`` vector and
    fixed DFT basis registered as Parameters."""
    total = 0
    for layer in params['layers']:
        for v in layer.values():
            total += int(np.prod(v.shape)) * np.finfo(np.dtype(v.dtype)).bits
    total += int(np.prod(params['div'].shape)) * np.finfo(np.dtype(params['div'].dtype)).bits
    return total


def scale_norm(params) -> jax.Array:
    """Frobenius norm of the single decode matrix (ref :170-174).

    Only valid for 0-hidden-layer decoders; used by the trainer to rescale the
    grid learning rate.
    """
    return jnp.linalg.norm(params['layers'][0]['scale'])


def recalibrate_div(params, latents, norm: str):
    """Return params with ``div`` recalibrated from current latents.

    Mirrors image_trainer.py:284-296: 'max' -> per-channel
    max(|min|, |max|), 'std' -> per-channel std.
    """
    if norm == 'max':
        new_div = jnp.maximum(jnp.abs(latents.min(axis=0)), jnp.abs(latents.max(axis=0)))
    elif norm == 'std':
        new_div = latents.std(axis=0)
    elif norm == 'none':
        return params
    else:
        raise ValueError(f'unknown norm {norm}')
    return {**params, 'div': new_div}


# ---------------------------------------------------------------------------
# Identity decoder (uncompressed path / post-decode inference), ref :202-228.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DecoderIdentityConfig:
    latent_dim: int = 1


def decoder_identity_apply(params, cfg, weight, **_):
    return weight


# ---------------------------------------------------------------------------
# MultiLatentDecoder: K decoders + per-entry soft/hard assignment.
# Port of wisp/models/latent_decoders/multi_latent_decoder.py:84-210.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MultiLatentDecoderConfig:
    latent_dim: int
    feature_dim: int
    num_entries: int
    num_decoders: int = 2
    norm: str = 'none'
    ldecode_matrix: str = 'sq'
    use_shift: bool = False
    num_layers_dec: int = 0
    hidden_dim_dec: int = 0
    activation: str = 'none'
    final_activation: str = 'none'
    clamp_weights: float = 0.0
    ldec_std: float = 1.0
    alpha_std: float = 1.0
    use_sga: bool = False
    diff_sampling: bool = False

    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        return LatentDecoderConfig(
            self.latent_dim, self.feature_dim,
            num_layers_dec=self.num_layers_dec,
            hidden_dim_dec=self.hidden_dim_dec).layer_dims()


def multi_latent_decoder_init(rng, cfg: MultiLatentDecoderConfig):
    """K per-layer decode matrices [K, in, out] + assignment logits
    ``alpha`` [K, num_entries] (ref :131-145)."""
    layers = []
    dims = cfg.layer_dims()
    keys = jax.random.split(rng, len(dims) + 1)
    for k, (din, dout) in zip(keys[:-1], dims):
        layer = {}
        if 'dft' in cfg.ldecode_matrix:
            layer['dft'] = jnp.asarray(get_dft_matrix(din, dout))
            layer['scale'] = jax.random.normal(
                k, (cfg.num_decoders, 1, dout)) * cfg.ldec_std
        else:
            layer['scale'] = jax.random.normal(
                k, (cfg.num_decoders, din, dout)) * cfg.ldec_std
        if cfg.use_shift:
            layer['shift'] = jnp.zeros((cfg.num_decoders, 1, dout))
        layers.append(layer)
    alpha = jax.random.normal(keys[-1], (cfg.num_decoders, cfg.num_entries)) \
        * cfg.alpha_std
    return {'layers': layers, 'alpha': alpha,
            'div': jnp.ones((cfg.latent_dim,))}


def ste_one_hot(alpha):
    """Hard one-hot of argmax over decoders with straight-through grads
    (StraightThroughOneHot, ref :15-25).  alpha: [K, T]."""
    hard = jax.nn.one_hot(jnp.argmax(alpha, axis=0), alpha.shape[0]).T
    return alpha + jax.lax.stop_gradient(hard - alpha)


def multi_latent_decoder_apply(params, cfg: MultiLatentDecoderConfig, weight, *,
                               use_sga: bool = False, temperature: float = 1.0,
                               straight_through: bool = True,
                               rng: Optional[jax.Array] = None):
    """Quantize + decode with a learned mixture of K decoders (ref :188-210).

    Effective math of the reference layer (ref :64-77 — note the reference's
    double alpha application is a no-op for the non-DFT path since softmax
    weights sum to 1): ``out_t = sum_k a_kt (x_t @ S_k) + sum_k a_kt shift_k``.
    """
    alpha = jax.nn.softmax(params['alpha'] / temperature, axis=0)   # [K, T]
    if straight_through:
        alpha = ste_one_hot(alpha)
    if use_sga:
        assert rng is not None
        w = sga_quantize(weight, temperature, rng, cfg.diff_sampling)
    else:
        w = ste_round(weight)
    x = w / params['div']
    act = _ACTIVATIONS[cfg.activation]
    n = len(params['layers'])
    for i, layer in enumerate(params['layers']):
        if 'dft' in cfg.ldecode_matrix:
            base = jnp.matmul(x, layer['dft'])                       # [T, F]
            mixed = jnp.einsum('kt,kf->tf', alpha,
                               layer['scale'][:, 0, :]) * base
        else:
            mixed = jnp.einsum('tl,klf,kt->tf', x, layer['scale'], alpha)
        if 'shift' in layer:
            mixed = mixed + jnp.einsum('kt,kf->tf', alpha, layer['shift'][:, 0, :])
        x = act(mixed) if i < n - 1 else mixed
    x = _ACTIVATIONS[cfg.final_activation](x)
    if cfg.clamp_weights > 0.0:
        x = jnp.clip(x, -cfg.clamp_weights, cfg.clamp_weights)
    return x


def multi_latent_decoder_size_bits(params, use_codec: bool = False) -> float:
    """fp bits of non-alpha params + entropy-coded argmax assignments
    (ref size(), :164-186)."""
    import numpy as np_
    from shacira_tpu.ops import coding
    fp = 0
    for layer in params['layers']:
        for v in layer.values():
            fp += int(np_.prod(v.shape)) * np_.finfo(np_.dtype(v.dtype)).bits
    fp += int(np_.prod(params['div'].shape)) * 32
    assign = np_.asarray(jnp.argmax(params['alpha'], axis=0))
    if use_codec:
        return fp + coding.coded_size_bits(assign)
    return fp + coding.entropy_bits_histogram(assign)


# ---------------------------------------------------------------------------
# HierarchicalLatentDecoder: independent LatentDecoder per LOD slice.
# Port of wisp/models/latent_decoders/hierarchical_latent_decoder.py:3-36.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HierarchicalLatentDecoderConfig:
    num_decoders: int                      # = num_lods
    offsets: Tuple[int, ...]               # LOD slice boundaries, len L+1
    decoder: LatentDecoderConfig


def hierarchical_latent_decoder_init(rng, cfg: HierarchicalLatentDecoderConfig):
    keys = jax.random.split(rng, cfg.num_decoders)
    return {'decoders': [latent_decoder_init(k, cfg.decoder) for k in keys]}


def hierarchical_latent_decoder_apply(params, cfg: HierarchicalLatentDecoderConfig,
                                      weight, *, use_sga: bool = False,
                                      temperature: float = 1.0,
                                      rng: Optional[jax.Array] = None):
    outs = []
    keys = (jax.random.split(rng, cfg.num_decoders)
            if rng is not None else [None] * cfg.num_decoders)
    for l in range(cfg.num_decoders):
        sl = weight[cfg.offsets[l]:cfg.offsets[l + 1]]
        outs.append(latent_decoder_apply(params['decoders'][l], cfg.decoder, sl,
                                         use_sga=use_sga, temperature=temperature,
                                         rng=keys[l]))
    return jnp.concatenate(outs, axis=0)


def hierarchical_latent_decoder_size_bits(params) -> int:
    return sum(latent_decoder_size_bits(d) for d in params['decoders'])
