"""LatentGrid — SHACIRA's compressed multi-resolution latent hash grid.

TPU-native re-design of ``wisp/models/grids/latent_grid.py`` (reference):
a single concatenated multi-LOD latent table is quantized (STE/SGA) and
decoded by a small learned decoder into hash-grid features; a learned entropy
model (BitEstimator) provides the rate loss; size accounting entropy-codes the
rounded latents.

Differences from the reference born of the TPU design (not of semantics):
  * the whole pipeline — quantize, decode, multi-LOD gather/interp — is one
    jitted XLA program (the reference crosses the Python/CUDA boundary per
    LOD);
  * randomness (SGA sampling, rate-loss noise) is driven by explicit PRNG
    keys threaded through ``interpolate``/``ent_loss``;
  * occupancy for NeRF raymarching lives in a dense bitmask grid
    (:mod:`shacira_tpu.accel.occupancy`) instead of a kaolin SPC octree.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.ops.hashgrid import (
    HashGridSpec, geometric_resolutions, octree_resolutions, hash_encode,
    hash_encode_affine,
)
from shacira_tpu.ops import coding
from shacira_tpu.models.latent_decoders import (
    LatentDecoderConfig, latent_decoder_init, latent_decoder_apply,
    latent_decoder_size_bits, latent_decoder_is_affine,
    latent_decoder_affine_parts,
    MultiLatentDecoderConfig, multi_latent_decoder_init,
    multi_latent_decoder_apply, multi_latent_decoder_size_bits,
    HierarchicalLatentDecoderConfig, hierarchical_latent_decoder_init,
    hierarchical_latent_decoder_apply, hierarchical_latent_decoder_size_bits,
)
from shacira_tpu.models.prob_models import (
    BitEstimatorConfig, bit_estimator_init, bit_estimator_apply, entropy_bits,
)


@dataclass(frozen=True)
class LatentGridConfig:
    """Static configuration (see reference LatentGrid.__init__, :32-120)."""
    feature_dim: int
    resolutions: Tuple[int, ...]
    latent_dim: int = 0                   # 0 -> same as feature_dim (ref :81)
    multiscale_type: str = 'sum'          # 'sum' | 'cat'
    resolution_dim: int = 3
    feature_std: float = 0.0
    feature_bias: float = 0.0
    codebook_bitwidth: int = 8
    init_grid: str = 'normal'             # 'normal' | 'uniform'
    ldec: Optional[LatentDecoderConfig] = None
    ldecode_type: str = 'single'          # 'single' | 'multi' | 'hierarchical'
    num_decoders: int = 2                 # for 'multi'
    alpha_std: float = 1.0                # for 'multi'
    num_prob_layers: int = 4
    noise_freq: int = 1
    entropy_enabled: bool = False
    hash_layout: str = 'xor'              # 'xor' | 'paged' (ops/paged_hash.py)
    page_res: int = 16                    # paged layout: pages per axis (16
                                          # general; 32 = 4x less MXU work
                                          # per corner but needs finer LODs
                                          # and shorter segments)

    @property
    def effective_latent_dim(self) -> int:
        return self.feature_dim if self.latent_dim == 0 else self.latent_dim

    @property
    def spec(self) -> HashGridSpec:
        return HashGridSpec(self.resolutions, self.codebook_bitwidth,
                            self.resolution_dim, hash_layout=self.hash_layout,
                            page_res=self.page_res)

    @property
    def num_lods(self) -> int:
        return len(self.resolutions)

    @property
    def output_dim(self) -> int:
        """Feature dim after multiscale aggregation."""
        if self.multiscale_type == 'cat':
            return self.feature_dim * self.num_lods
        return self.feature_dim

    @property
    def prob_cfg(self) -> BitEstimatorConfig:
        return BitEstimatorConfig(self.effective_latent_dim, self.num_prob_layers)

    # -- constructors (reference :192-328) ---------------------------------
    @classmethod
    def from_geometric(cls, feature_dim, num_lods, min_grid_res, max_grid_res, **kw):
        res = geometric_resolutions(min_grid_res, max_grid_res, num_lods)
        return cls(feature_dim=feature_dim, resolutions=res, **kw)

    @classmethod
    def from_octree(cls, feature_dim, base_lod, num_lods, **kw):
        return cls(feature_dim=feature_dim,
                   resolutions=octree_resolutions(base_lod, num_lods), **kw)

    def with_ldec(self, ldec_kwargs: dict, ldecode_type: str = 'single',
                  **type_kwargs) -> 'LatentGridConfig':
        ldec = LatentDecoderConfig(latent_dim=self.effective_latent_dim,
                                   feature_dim=self.feature_dim, **ldec_kwargs)
        return replace(self, ldec=ldec, ldecode_type=ldecode_type, **type_kwargs)

    @property
    def multi_cfg(self) -> 'MultiLatentDecoderConfig':
        d = self.ldec
        return MultiLatentDecoderConfig(
            latent_dim=d.latent_dim, feature_dim=d.feature_dim,
            num_entries=self.spec.total_size, num_decoders=self.num_decoders,
            norm=d.norm, ldecode_matrix=d.ldecode_matrix, use_shift=d.use_shift,
            num_layers_dec=d.num_layers_dec, hidden_dim_dec=d.hidden_dim_dec,
            activation=d.activation, final_activation=d.final_activation,
            clamp_weights=d.clamp_weights, ldec_std=d.ldec_std,
            alpha_std=self.alpha_std, use_sga=d.use_sga,
            diff_sampling=d.diff_sampling)

    @property
    def hier_cfg(self) -> 'HierarchicalLatentDecoderConfig':
        spec = self.spec
        offsets = tuple(spec.lod_first_idx) + (spec.total_size,)
        return HierarchicalLatentDecoderConfig(
            num_decoders=spec.num_lods, offsets=offsets, decoder=self.ldec)


def latent_grid_init(rng, cfg: LatentGridConfig):
    """Initialize codebook + decoder + entropy model params.

    Codebook init mirrors latent_grid.py:98-112: per-LOD tables of size
    ``min(2**bw, res**dim)`` filled with uniform(+-std) or normal(std) noise
    around ``feature_bias``, then concatenated.
    """
    spec = cfg.spec
    k_cb, k_dec, k_prob = jax.random.split(rng, 3)
    ldim = cfg.effective_latent_dim
    if cfg.init_grid == 'uniform':
        cb = (jax.random.uniform(k_cb, (spec.total_size, ldim)) - 0.5) * 2 * cfg.feature_std
    elif cfg.init_grid == 'normal':
        cb = jax.random.normal(k_cb, (spec.total_size, ldim)) * cfg.feature_std
    else:
        raise ValueError(cfg.init_grid)
    cb = cb + cfg.feature_bias
    params = {'codebook': cb}
    if cfg.ldec is not None:
        if cfg.ldecode_type == 'multi':
            params['latent_dec'] = multi_latent_decoder_init(k_dec, cfg.multi_cfg)
        elif cfg.ldecode_type == 'hierarchical':
            params['latent_dec'] = hierarchical_latent_decoder_init(k_dec, cfg.hier_cfg)
        else:
            params['latent_dec'] = latent_decoder_init(k_dec, cfg.ldec)
        if cfg.entropy_enabled:
            params['prob_model'] = bit_estimator_init(k_prob, cfg.prob_cfg)
    return params


def supports_affine_fusion(cfg: LatentGridConfig) -> bool:
    """Whether the grid can use the latent-width fused backward
    (hash_encode_affine): single affine latent decoder."""
    return (cfg.ldec is not None and cfg.ldecode_type == 'single'
            and latent_decoder_is_affine(cfg.ldec))


def affine_parts(params, cfg: LatentGridConfig, *, use_sga: bool = False,
                 temperature: float = 1.0, rng: Optional[jax.Array] = None):
    """(z, matrix, shift) for the fused encode; see supports_affine_fusion."""
    return latent_decoder_affine_parts(
        params['latent_dec'], cfg.ldec, params['codebook'],
        use_sga=use_sga, temperature=temperature, rng=rng)


def decode_codebook(params, cfg: LatentGridConfig, *,
                    use_sga: bool = False, temperature: float = 1.0,
                    rng: Optional[jax.Array] = None):
    """Quantize + decode the full latent table -> feature table [T, F].

    The reference likewise decodes the whole codebook per step
    (latent_grid.py:359).  On TPU this is a small MXU matmul fused with the
    quantizer — far cheaper than decoding gathered corners.
    """
    if cfg.ldec is None:
        return params['codebook']
    if cfg.ldecode_type == 'multi':
        # straight_through is enabled after decay_period in the reference
        # (image_trainer.py:140-141); eval/round mode implies straight-through
        return multi_latent_decoder_apply(
            params['latent_dec'], cfg.multi_cfg, params['codebook'],
            use_sga=use_sga, temperature=temperature,
            straight_through=not use_sga, rng=rng)
    if cfg.ldecode_type == 'hierarchical':
        return hierarchical_latent_decoder_apply(
            params['latent_dec'], cfg.hier_cfg, params['codebook'],
            use_sga=use_sga, temperature=temperature, rng=rng)
    return latent_decoder_apply(params['latent_dec'], cfg.ldec, params['codebook'],
                                use_sga=use_sga, temperature=temperature, rng=rng)


def interpolate(params, cfg: LatentGridConfig, coords, *,
                use_sga: bool = False, temperature: float = 1.0,
                rng: Optional[jax.Array] = None,
                lod_mask: Optional[jax.Array] = None,
                decoded: Optional[jax.Array] = None,
                static_plan=None,
                encoder=None,
                affine=None):
    """Query multiscale features at ``coords`` (reference interpolate, :340-382).

    Args:
        coords: [..., resolution_dim] in [-1, 1].
        lod_mask: optional [num_lods] 0/1 mask (the reference's
            RENDERING_FINAL env masks LODs above lod_idx, :372-375).
        decoded: optionally pass a pre-decoded feature table (inference path —
            the reference's valid-only mode decodes once and swaps in a
            DecoderIdentity, main_image.py:591-600).
    Returns:
        [..., output_dim] features.
    """
    lead_shape = coords.shape[:-1]
    coords = coords.reshape(-1, coords.shape[-1])
    if affine is not None:
        from shacira_tpu.ops.hashgrid import hash_encode_affine
        z, matrix, shift = affine
        feats = hash_encode_affine(coords, z, matrix, shift, cfg.spec)
        if lod_mask is not None:
            feats = feats * lod_mask[None, :, None]
        if cfg.multiscale_type == 'cat':
            out = feats.reshape(feats.shape[0], -1)
        else:
            out = feats.sum(axis=1)
        return out.reshape(*lead_shape, out.shape[-1])
    if decoded is None:
        decoded = decode_codebook(params, cfg, use_sga=use_sga,
                                  temperature=temperature, rng=rng)
    if encoder is not None:
        feats = encoder(decoded)                         # [N, L, F]
    elif static_plan is not None:
        from shacira_tpu.ops.hashgrid import static_hash_encode
        meta, arrays = static_plan
        feats = static_hash_encode(arrays, decoded, meta)
    else:
        feats = hash_encode(coords, decoded, cfg.spec)   # [N, L, F]
    if lod_mask is not None:
        feats = feats * lod_mask[None, :, None]
    if cfg.multiscale_type == 'cat':
        out = feats.reshape(feats.shape[0], -1)
    elif cfg.multiscale_type == 'sum':
        out = feats.sum(axis=1)
    else:
        raise NotImplementedError(cfg.multiscale_type)
    return out.reshape(*lead_shape, out.shape[-1])


def paged_zbar(params, cfg: LatentGridConfig, coords, grouping,
               seg_size: int, *, affine, occ_slab=None, occ_res: int = 0):
    """Block-local latent interpolation on segment-ordered rows.

    Every kernel-eligible LOD — paged hashed LODs via page neighborhoods
    AND direct dense LODs via per-cell slabs (ops/paged_hash.py) — is
    interpolated in one fused Pallas pass over the grouped slot rows.
    Returns ``zbar [K*G, Lk, ld]`` raw interpolated latents in ascending
    LOD order (decode after interpolation is exact for affine decoders
    since trilinear weights sum to 1)."""
    from shacira_tpu.ops import paged_hash as ph
    z, matrix, shift = affine
    spec = cfg.spec
    n2 = coords.shape[0]
    k2 = n2 // seg_size
    # slot the rows by grouping cell, interpolate latents, map back
    s2s = grouping['slotseg_to_seg']                       # [n_slotseg]
    n_slotseg = s2s.shape[0]
    rows = coords.reshape(k2, seg_size * 3)
    coords_s = jnp.take(rows, jnp.minimum(s2s, k2 - 1), axis=0)
    sv_seg = s2s < k2
    coords_s = jnp.where(sv_seg[:, None], coords_s, 0.0)
    coords_s = coords_s.reshape(n_slotseg * seg_size, 3)
    slot_valid = jnp.repeat(sv_seg, seg_size)
    static = ph.default_static(spec, include_direct=True)
    if occ_slab is not None and occ_res > 0:
        from dataclasses import replace as _replace
        static = _replace(static, occ_res=occ_res)
    zbar_s = ph.paged_interp_lods(coords_s, slot_valid, grouping['block_cell'],
                                  grouping['cell_used'], z, occ_slab, static)
    lk, ld = len(static.all_lods) + (1 if static.occ_res else 0), z.shape[-1]
    zbar_rows = ph.permute_rows(
        zbar_s.reshape(n_slotseg, seg_size * lk * ld),
        grouping['seg_to_slotseg'], s2s, k2)
    return zbar_rows.reshape(n2, lk, ld)


def paged_finish(params, cfg: LatentGridConfig, zbar, coords, *,
                 affine, lod_mask: Optional[jax.Array] = None):
    """Decode the block-local latents into features on the (compacted) rows.

    All direct + paged LODs were interpolated in-kernel on the slot rows
    (:func:`paged_zbar`), so this stage is just the affine decode — plus a
    gather-encode fallback for any hashed-but-unpageable LODs (none in the
    standard lego/pearl specs)."""
    from shacira_tpu.ops import paged_hash as ph
    z, matrix, shift = affine
    spec = cfg.spec
    rest, direct, pag = ph.blocklocal_lods(spec)
    kernel_lods = direct + pag
    n = coords.shape[0]
    zbar = zbar.reshape(n, len(kernel_lods), z.shape[-1])
    decoded = zbar @ matrix + shift                        # [N, Lk, F]
    if rest:
        feats_rest = hash_encode_affine(coords, z, matrix, shift, spec,
                                        tuple(rest))       # [N, Lr, F]
        parts = {}
        for i, lod in enumerate(rest):
            parts[lod] = feats_rest[:, i]
        for i, lod in enumerate(kernel_lods):
            parts[lod] = decoded[:, i]
        feats = jnp.stack([parts[l] for l in range(spec.num_lods)], axis=1)
    else:
        feats = decoded
    if lod_mask is not None:
        feats = feats * lod_mask[None, :, None]
    if cfg.multiscale_type == 'cat':
        return feats.reshape(n, -1)
    return feats.sum(axis=1)


def interpolate_paged(params, cfg: LatentGridConfig, coords, grouping,
                      seg_size: int, *, use_sga: bool = False,
                      temperature: float = 1.0,
                      rng: Optional[jax.Array] = None,
                      lod_mask: Optional[jax.Array] = None,
                      affine=None):
    """Paged fast-path interpolate (affine decoders, segment-grouped rows).

    Direct/small LODs run the plain gather path; paged LODs (a suffix, see
    ops/paged_hash.py) interpolate raw latents with the block-local MXU
    kernels and decode *after* interpolation (exact for affine decoders since
    trilinear weights sum to 1).

    Args:
        coords: [K*G, 3] segment-ordered sample rows in [-1, 1].
        grouping: dict from ``paged_hash.group_segments`` over the K segments.
        seg_size: G (static).
    Returns:
        [K*G, output_dim] features.
    """
    if affine is None:
        affine = affine_parts(params, cfg, use_sga=use_sga,
                              temperature=temperature, rng=rng)
    zbar = paged_zbar(params, cfg, coords, grouping, seg_size, affine=affine)
    return paged_finish(params, cfg, zbar, coords, affine=affine,
                        lod_mask=lod_mask)


def ent_loss(params, cfg: LatentGridConfig, noise, *, is_val: bool = False):
    """Rate loss: (bits per latent entry, total bits).

    Mirrors LatentGrid.ent_loss (latent_grid.py:122-136): estimate bits of
    ``codebook + U(-.5,.5)`` noise (or ``round(codebook)`` at validation).
    ``noise`` is carried in the train state and refreshed every ``noise_freq``
    iterations by the trainer.
    """
    if 'prob_model' not in params:
        return 0.0, 0.0
    cb = params['codebook']
    weight = jnp.round(cb) if is_val else cb + noise
    total_bits = entropy_bits(params['prob_model'], cfg.prob_cfg, weight)
    return total_bits / cb.shape[0], total_bits


def stream_side_info_bits(params) -> int:
    """Bits of side information a HISTOGRAM-coded latent stream needs to be
    decodable: per latent channel, the symbol count (32), alphabet size
    (16), the alphabet values (int16 each — SHACIRA latents round to a few
    hundred distinct integers) and a 16-bit-quantized CDF entry per symbol
    (torchac's precision).  The reference reports only ``len(byte_stream)``
    (latent_grid.py:168-172) and ships neither — its reported size is not
    decodable as-is; we count both accountings (PARITY.md)."""
    cb = np.asarray(params['codebook'])
    bits = 0
    for c in range(cb.shape[1]):
        w = np.round(cb[:, c]).astype(np.int64)
        # int16 alphabet values: SHACIRA latents round to a few hundred
        # distinct small integers (the reference's torchac path makes the
        # same implicit int16 assumption); guard rather than undercount
        assert np.abs(w).max(initial=0) < 2 ** 15, (
            f'latent magnitude {np.abs(w).max()} overflows the int16 '
            'alphabet encoding of the side info')
        a = int(np.unique(w).shape[0])
        bits += 32 + 16 + a * 16 + a * 16
    return bits


def prob_model_size_bits(params) -> int:
    """fp32 bits of the BitEstimator parameters — the side information the
    PROB-MODEL-coded stream needs (the decoder evaluates the model CDF;
    no alphabet/histogram is transmitted).  The reference never counts it
    (nor transmits it); it is ~0.1 kB."""
    if 'prob_model' not in params:
        return 0
    leaves = jax.tree.leaves(params['prob_model'])
    return int(sum(np.prod(l.shape) for l in leaves)) * 32


def grid_size_bits(params, cfg: LatentGridConfig, *, use_codec: bool = False,
                   use_prob_model: bool = False,
                   count_side_info: bool = False):
    """(decoder_bits, latent_bits): compressed size accounting.

    ``count_side_info``: add what the stream needs to be decodable —
    histogram mode: alphabet + quantized CDF per channel
    (:func:`stream_side_info_bits`); prob-model mode: the BitEstimator
    parameters (:func:`prob_model_size_bits`).

    Mirrors LatentGrid.size (latent_grid.py:138-174): per-latent-channel
    entropy of the rounded codebook, from the histogram (or prob model CDF),
    either as the information-theoretic estimate or a real arithmetic-coded
    stream length.  Host-side.

    NOTE on ``use_prob_model and use_codec``: the reference *computes* the
    model CDF in that combination but then overwrites it with the empirical
    histogram CDF before calling torchac (latent_grid.py:156-167), so its
    coded stream never uses the prob model.  We implement the documented
    intent instead and code with the model CDF (the paper's decoder only has
    the prob model available — a histogram stream would not be decodable
    without also transmitting the histogram).
    """
    if cfg.ldec is None:
        # Uncompressed HashGrid: raw fp bits (hash_grid.py:101-102 in ref).
        cb = params['codebook']
        return 0, int(np.prod(cb.shape)) * np.finfo(np.dtype(cb.dtype)).bits
    if cfg.ldecode_type == 'multi':
        ldec_bits = multi_latent_decoder_size_bits(params['latent_dec'],
                                                   use_codec=use_codec)
    elif cfg.ldecode_type == 'hierarchical':
        ldec_bits = hierarchical_latent_decoder_size_bits(params['latent_dec'])
    else:
        ldec_bits = latent_decoder_size_bits(params['latent_dec'])
    cb = np.asarray(params['codebook'])
    codebook_bits = 0.0
    for c in range(cb.shape[1]):
        w = np.round(cb[:, c]).astype(np.int64)
        if use_prob_model:
            uniq, counts = np.unique(w, return_counts=True)
            pm = params['prob_model']
            probs = np.asarray(
                bit_estimator_apply(pm, cfg.prob_cfg, jnp.asarray(uniq + 0.5, jnp.float32), single_channel=c)
                - bit_estimator_apply(pm, cfg.prob_cfg, jnp.asarray(uniq - 0.5, jnp.float32), single_channel=c))
            if use_codec:
                codebook_bits += coding.coded_size_bits(w, probs=probs)
            else:
                info = np.clip(-np.log(probs + 1e-10) / np.log(2.0), 0, 1000)
                codebook_bits += float(np.sum(info * counts))
        elif use_codec:
            codebook_bits += coding.coded_size_bits(w)
        else:
            codebook_bits += coding.entropy_bits_histogram(w)
    if count_side_info:
        codebook_bits += (prob_model_size_bits(params) if use_prob_model
                          else stream_side_info_bits(params))
    return ldec_bits, codebook_bits


def encode_grid_stream(params, cfg: LatentGridConfig, *,
                       use_prob_model: bool = False) -> dict:
    """Serialize the rounded latent codebook to real arithmetic codestreams.

    Goes beyond the reference (which only measures ``len(byte_stream)`` and
    never decodes, latent_grid.py:168-172): returns everything needed to
    rebuild the quantized grid, so the reported size provably corresponds to
    a decodable model.  Per channel: symbols ``round(cb[:,c]) - min`` coded
    over their dense alphabet with the histogram CDF (or the BitEstimator
    model CDF when ``use_prob_model``).
    """
    cb = np.asarray(params['codebook'])
    channels = []
    for c in range(cb.shape[1]):
        w = np.round(cb[:, c]).astype(np.int64)
        uniq, inv = np.unique(w, return_inverse=True)
        if use_prob_model:
            pm = params['prob_model']
            probs = np.asarray(
                bit_estimator_apply(pm, cfg.prob_cfg,
                                    jnp.asarray(uniq + 0.5, jnp.float32),
                                    single_channel=c)
                - bit_estimator_apply(pm, cfg.prob_cfg,
                                      jnp.asarray(uniq - 0.5, jnp.float32),
                                      single_channel=c))
            probs = np.maximum(probs, 1e-10)
            probs = probs / probs.sum()
        else:
            counts = np.bincount(inv)
            probs = counts / counts.sum()
        stream = coding.ArithmeticCoder.encode(inv, probs)
        channels.append({'stream': stream, 'alphabet': uniq, 'probs': probs,
                         'n': int(w.shape[0])})
    return {'channels': channels, 'latent_dim': cb.shape[1]}


def decode_grid_stream(blob: dict) -> np.ndarray:
    """Inverse of :func:`encode_grid_stream`: rebuild ``round(codebook)``."""
    cols = []
    for ch in blob['channels']:
        inv = coding.ArithmeticCoder.decode(ch['stream'], ch['probs'], ch['n'])
        cols.append(ch['alphabet'][inv])
    return np.stack(cols, axis=1).astype(np.float32)


def rounding_loss(params) -> jax.Array:
    """mean |w - round(w)| diagnostic (ref image_trainer.py:170)."""
    cb = params['codebook']
    return jnp.mean(jnp.abs(cb - jnp.round(cb)))
