"""Multi-resolution hash-grid encoding (Instant-NGP style) for TPU.

TPU-native re-design of the reference CUDA kernels
(`wisp/csrc/ops/hashgrid_interpolate_cuda.cu`,
 `wisp/csrc/ops/hashgrid_interpolate2d_cuda.cu` in the reference repo):

* All LODs are evaluated inside one jitted XLA program (the reference launches
  one CUDA kernel per LOD).
* The variable "8 corners + atomicAdd" backward becomes a deterministic XLA
  scatter-add (or an MXU one-hot matmul for small tables) via a custom VJP.
* Semantics match the reference exactly:
  - coordinate mapping ``x = clamp(res * (c * 0.5 + 0.5), 0, res - 1 - 1e-5)``
    (reference .cu:68-70),
  - direct linear indexing when ``res**dim < codebook_size`` else XOR hash with
    primes ``{1, 2654435761, 805459861}`` modulo the table size
    (reference .cu:17-39),
  - output layout ``[N, num_lods * feature_dim]`` with LOD-major feature
    blocks (reference .cu:106).

The codebook is a single concatenated multi-LOD table ``[sum(sizes), F]`` with
per-LOD offsets, mirroring ``wisp/models/grids/latent_grid.py:98-112``.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# XOR-hash primes, identical to the reference kernels
# (hashgrid_interpolate_cuda.cu:25, hashgrid_interpolate2d_cuda.cu:25).
PRIMES = (1, 2654435761, 805459861)

# Coarse spatial bins per axis for the 'paged' hash layout (see
# HashGridSpec.hash_layout).  P = page_res**dim pages; entries per page
# E = codebook_size / P.  16 is the default; 32 quarters the per-corner MXU
# work of the paged kernels (entries-per-page shrinks 8x and the contraction
# swaps to the 64-slot neighborhood axis) but requires finer LODs
# (res >= 2*page_res) and shorter segments — lego-style ray configs use it,
# voxel/V8 configs keep 16 (see ops/paged_hash.validate_paged_cover).
PAGE_RES = 16

# Entries-per-page below this get a bit-folding finalizer before the mask:
# with few entries the bare XOR-prime hash masks to its low bits only
# (PRIMES are all == 1 mod 4, so a 2-bit mask degenerates to c0^c1^c2),
# which measurably skews collisions; folding the high bytes down restores
# the global hash's distribution (tests/test_paged_hash.py).
SMALL_PAGE_ENTRIES = 32


def fold_hash(acc, e: int):
    """Mask an XOR-prime hash accumulator to ``e`` entries, folding high
    bits down first when the page is small.  ``acc`` is uint32 (host) or a
    uint32 array (in-kernel) — both use this exact formula."""
    if e < SMALL_PAGE_ENTRIES:
        acc = acc ^ (acc >> 8) ^ (acc >> 16) ^ (acc >> 24)
    return acc & (e - 1)


def paged_params(res: int, codebook_size: int, dim: int,
                 page_res: int = PAGE_RES):
    """(num_pages, entries_per_page) for a paged hashed LOD, or None when the
    LOD cannot be paged (direct-indexed, table not divisible by P, or fewer
    than 4 entries per page)."""
    if use_direct_index(res, codebook_size, dim):
        return None
    p = page_res ** dim
    if codebook_size % p or codebook_size < 4 * p:
        return None
    return p, codebook_size // p


def _int32_wrap(x: int) -> int:
    """Emulate C int32 overflow for the direct-index condition.

    The reference computes ``resolution * resolution (* resolution)`` in int32
    (hashgrid_interpolate_cuda.cu:27-29); for resolutions above 2**15.5 the
    product wraps.  We reproduce that statically so index layouts match.
    """
    return ((int(x) + 2 ** 31) % 2 ** 32) - 2 ** 31


def use_direct_index(resolution: int, codebook_size: int, dim: int) -> bool:
    """True when a LOD addresses its table directly instead of hashing.

    Mirrors ``hash_index`` in the reference CUDA (cu:27-29 for 3D, 2d cu:27-28
    for 2D): every partial power ``res, res^2, .., res^dim`` must be below the
    table size (partial products evaluated with int32 wrap semantics).
    """
    acc = 1
    for _ in range(dim):
        acc = _int32_wrap(acc * resolution)
        if acc >= codebook_size:
            return False
    return True


@dataclass(frozen=True)
class HashGridSpec:
    """Static layout of a concatenated multi-LOD hash table.

    Attributes:
        resolutions: per-LOD grid resolution (static).
        codebook_bitwidth: table size cap is ``2 ** bitwidth``.
        dim: coordinate dimensionality (2 for images, 3 for NeRF/SDF).
        hash_layout: 'xor' — the reference XOR-prime hash
            (hashgrid_interpolate_cuda.cu:17-39); 'paged' — TPU-native
            spatially-paged layout: entry = page(cell) * E + (xor_hash & E-1)
            where page is the cell's coarse spatial bin at
            ``PAGE_RES`` per axis.  Same capacity and (statistically) the
            same collision rate as 'xor', but corner entries of spatially
            close samples land in the same page, which lets the encode run
            as page-local one-hot matmuls (ops/paged_hash.py) instead of
            random HBM gathers.
    """
    resolutions: Tuple[int, ...]
    codebook_bitwidth: int
    dim: int
    hash_layout: str = 'xor'
    page_res: int = PAGE_RES      # 'paged' layout: pages per axis

    @property
    def codebook_size(self) -> int:
        return 2 ** self.codebook_bitwidth

    @property
    def num_lods(self) -> int:
        return len(self.resolutions)

    @functools.cached_property
    def lod_sizes(self) -> Tuple[int, ...]:
        """Per-LOD table sizes: ``min(2**bw, res**dim)``.

        Mirrors codebook construction at latent_grid.py:101-111.
        """
        return tuple(
            min(self.codebook_size, int(res) ** self.dim) for res in self.resolutions
        )

    @functools.cached_property
    def lod_first_idx(self) -> Tuple[int, ...]:
        offs = np.concatenate([[0], np.cumsum(self.lod_sizes)[:-1]])
        return tuple(int(o) for o in offs)

    @property
    def total_size(self) -> int:
        return sum(self.lod_sizes)

    @functools.cached_property
    def corner_offsets(self) -> np.ndarray:
        """[2**dim, dim] binary corner offsets in reference bit order.

        Reference order (cu:88-93): corner j has x-offset in the HIGH bit and
        the last coordinate in the LOW bit, i.e. for dim=3
        ``corner = (j>>2 & 1, j>>1 & 1, j & 1)``.
        """
        n = 2 ** self.dim
        out = np.zeros((n, self.dim), dtype=np.int32)
        for j in range(n):
            for d in range(self.dim):
                out[j, d] = (j >> (self.dim - 1 - d)) & 1
        return out


def make_spec(resolutions: Sequence[int], codebook_bitwidth: int, dim: int) -> HashGridSpec:
    return HashGridSpec(tuple(int(r) for r in resolutions), int(codebook_bitwidth), int(dim))


def geometric_resolutions(min_grid_res: int, max_grid_res: int, num_lods: int) -> Tuple[int, ...]:
    """Instant-NGP geometric LOD progression (eq. 2-3).

    Matches ``LatentGrid.from_geometric`` (latent_grid.py:280-281):
    ``b = exp((ln max - ln min) / (L - 1)); res_l = floor(min * b**l) + 1``.
    """
    if num_lods == 1:
        return (int(1 + np.floor(min_grid_res)),)
    b = np.exp((np.log(max_grid_res) - np.log(min_grid_res)) / (num_lods - 1))
    return tuple(int(1 + np.floor(min_grid_res * (b ** l))) for l in range(num_lods))


def octree_resolutions(base_lod: int, num_lods: int) -> Tuple[int, ...]:
    """Power-of-two LOD progression (latent_grid.py:231-232)."""
    return tuple(2 ** (base_lod + l) for l in range(num_lods))


def _cell_and_frac(coords, res: int):
    """Shared coordinate transform: cell position [N, dim] + frac [N, dim]."""
    # Reference coordinate transform (cu:68-70).  NOTE: the reference's upper
    # clamp bound ``res - 1 - 1e-5`` rounds to ``res - 1`` in float32 for
    # res >~ 170, letting the +1 corner index reach ``res`` — an out-of-bounds
    # read the CUDA kernel silently absorbs (reads the next LOD's memory).
    # We clamp the cell to res-2 instead, which matches the float64 semantics
    # of the formula (cell in [0, res-2], frac in [0, 1]).
    x = jnp.clip(res * (coords.astype(jnp.float32) * 0.5 + 0.5), 0.0, res - 1 - 1e-5)
    pos = jnp.minimum(jnp.floor(x), max(res - 2, 0))
    frac = jnp.clip(x - pos, 0.0, 1.0)
    return pos.astype(jnp.int32), frac


def _corner_weights(frac, spec: HashGridSpec):
    """Multilinear weights [N, 2**dim] in reference corner order (cu:77-84)."""
    offs = jnp.asarray(spec.corner_offsets)          # [C, dim]
    w = jnp.where(offs[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
    return jnp.prod(w, axis=-1)                      # [N, C]


def _direct_strides(res: int, dim: int) -> Tuple[int, ...]:
    """Linear-index strides for a direct (dense) LOD: idx = Σ_d pos_d·res^d."""
    return tuple(res ** d for d in range(dim))


def _corner_shifts(res: int, spec: HashGridSpec) -> Tuple[int, ...]:
    """Static linear-index offset of each corner for a direct LOD.

    For dense tables, corner j of cell p lives at ``idx(p) + shift_j`` where
    ``shift_j = Σ_d offs[j,d]·res^d`` — the basis of the brick-packed gather.
    """
    strides = _direct_strides(res, spec.dim)
    return tuple(int(np.dot(spec.corner_offsets[j], strides))
                 for j in range(2 ** spec.dim))


def _lod_corner_indices_and_weights(coords, res: int, spec: HashGridSpec):
    """Per-LOD corner hash indices + multilinear weights.

    Args:
        coords: [N, dim] float32 in [-1, 1].
    Returns:
        idx: [N, 2**dim] int32 indices into the LOD-local table.
        w:   [N, 2**dim] float32 interpolation weights.
    """
    dim = spec.dim
    cs = spec.codebook_size
    pos, frac = _cell_and_frac(coords, res)

    offs = jnp.asarray(spec.corner_offsets)          # [C, dim]
    cpos = pos[:, None, :] + offs[None, :, :]        # [N, C, dim]
    w = _corner_weights(frac, spec)                  # [N, C]

    if use_direct_index(res, cs, dim):
        # index = x + y*res + z*res^2  (cu:30-32)
        strides = jnp.asarray(_direct_strides(res, dim), dtype=jnp.int32)
        idx = jnp.sum(cpos * strides[None, None, :], axis=-1)
    else:
        u = cpos.astype(jnp.uint32)
        acc = u[..., 0] * jnp.uint32(PRIMES[0])
        for d in range(1, dim):
            acc = acc ^ (u[..., d] * jnp.uint32(PRIMES[d]))
        paged = (spec.hash_layout == 'paged'
                 and paged_params(res, cs, dim, spec.page_res) is not None)
        if paged:
            _, e = paged_params(res, cs, dim, spec.page_res)
            page = _page_of_cell(cpos, res, dim, spec.page_res)
            idx = page * e + fold_hash(acc, e).astype(jnp.int32)
        else:
            # table size is a power of two, so % == bitmask (cu:36).
            idx = (acc & jnp.uint32(cs - 1)).astype(jnp.int32)
    return idx, w


def _page_of_cell(cpos, res: int, dim: int, page_res: int = PAGE_RES):
    """Coarse page id of integer cell coords (x-major linearization).

    ``page_axis = (cell * page_res) // res`` — exact integer arithmetic, so
    the kernel-side page math (ops/paged_hash.py) reproduces it bit-exactly.
    """
    pax = (cpos * page_res) // res                    # [..., dim]
    page = pax[..., 0]
    for d in range(1, dim):
        page = page * page_res + pax[..., d]
    return page


# Brick-packed gather for direct (dense) LODs: gather cost on TPU is per-ROW
# and flat in row width up to 128 lanes (measured ~6-10 ns/row on v5e), so
# packing all 2**dim corner rows of a cell into ONE wide row turns 2**dim
# gathers/sample into one.  The per-corner tables are shifted copies of the
# dense table (corner j of cell p lives at linear index idx(p) + shift_j),
# i.e. pure HBM-bandwidth copies — no gather — rebuilt per step.
BRICK_GATHER = True
_BRICK_MAX_LANES = 128


def _brick_applicable(res: int, width: int, spec: HashGridSpec) -> bool:
    return (BRICK_GATHER and res >= 2
            and use_direct_index(res, spec.codebook_size, spec.dim)
            and (2 ** spec.dim) * width <= _BRICK_MAX_LANES)


def _brick_gather(table, coords, res: int, spec: HashGridSpec):
    """One-row-per-sample corner gather for a direct LOD.

    Args:
        table: [size, W] dense LOD table (size == res**dim).
    Returns:
        gathered [N, C, W] float32, idx [N, C] int32 (per-corner, for the
        backward scatter), w [N, C] float32.
    """
    pos, frac = _cell_and_frac(coords, res)
    w = _corner_weights(frac, spec)
    strides = jnp.asarray(_direct_strides(res, spec.dim), jnp.int32)
    idx000 = jnp.sum(pos * strides[None, :], axis=-1)          # [N]
    shifts = _corner_shifts(res, spec)
    size, width = table.shape
    pad = jnp.zeros((max(shifts), width), table.dtype)
    padded = jnp.concatenate([table, pad], axis=0)
    brick = jnp.concatenate([padded[s:s + size] for s in shifts], axis=1)
    n = idx000.shape[0]
    gathered = jnp.take(brick, idx000, axis=0).astype(jnp.float32)
    gathered = gathered.reshape(n, len(shifts), width)          # [N, C, W]
    idx = idx000[:, None] + jnp.asarray(shifts, jnp.int32)[None, :]
    return gathered, idx, w


def _encode_fwd_impl(coords, codebook, spec: HashGridSpec):
    """Forward interpolation for every LOD. Returns feats [N, L, F] and residuals."""
    feats = []
    all_idx = []
    all_w = []
    for lod, res in enumerate(spec.resolutions):
        first = spec.lod_first_idx[lod]
        size = spec.lod_sizes[lod]
        table = jax.lax.dynamic_slice_in_dim(codebook, first, size, axis=0)
        if _brick_applicable(res, codebook.shape[-1], spec):
            gathered, idx, w = _brick_gather(table, coords, res, spec)
        else:
            idx, w = _lod_corner_indices_and_weights(coords, res, spec)
            gathered = jnp.take(table, idx, axis=0)   # [N, C, F]
        f = jnp.sum(gathered.astype(jnp.float32) * w[..., None], axis=1)  # [N, F]
        feats.append(f)
        all_idx.append(idx)
        all_w.append(w)
    out = jnp.stack(feats, axis=1)                    # [N, L, F]
    return out.astype(codebook.dtype), (all_idx, all_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(coords, codebook, spec: HashGridSpec):
    """Multi-LOD hash-grid interpolation.

    Args:
        coords: ``[N, dim]`` float coordinates in [-1, 1].
        codebook: ``[spec.total_size, F]`` concatenated multi-LOD table.
        spec: static :class:`HashGridSpec`.

    Returns:
        ``[N, num_lods, feature_dim]`` interpolated features (reshapeable to
        the reference's ``[N, L*F]`` layout).

    Gradients flow to ``codebook`` only — the reference backward likewise
    returns only ``grad_codebook`` (wisp/ops/grid.py:106-111).
    """
    out, _ = _encode_fwd_impl(coords, codebook, spec)
    return out


def _hash_encode_fwd(coords, codebook, spec):
    out, (all_idx, all_w) = _encode_fwd_impl(coords, codebook, spec)
    # zero-size slice keeps the codebook's shape[1:]/dtype as a jax-typed residual
    return out, (all_idx, all_w, codebook[:0])


def _hash_encode_bwd(spec, residuals, g):
    from shacira_tpu.ops.pallas_scatter import scatter_add
    all_idx, all_w, cb_meta = residuals
    cb_dtype = cb_meta.dtype
    # g: [N, L, F]
    g = g.astype(jnp.float32)
    f = g.shape[-1]
    grads = []
    for lod in range(spec.num_lods):
        idx, w = all_idx[lod], all_w[lod]             # [N, C]
        gl = g[:, lod, :]                             # [N, F]
        upd = (gl[:, None, :] * w[:, :, None]).reshape(-1, f)  # [N*C, F]
        grads.append(scatter_add(idx.reshape(-1), upd, spec.lod_sizes[lod]))
    return None, jnp.concatenate(grads, axis=0).astype(cb_dtype)


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# ---------------------------------------------------------------------------
# Affine-fused encode: gather from z @ scale + shift with a custom VJP that
# scatters latent-width rows.
#
# SHACIRA's default latent decoders are a single affine map (0 hidden layers,
# kodak.yaml / nerf_lego.yaml).  The hash-grid backward then factors:
#     grad_z[t]   = sum_{(n,c): idx=t} w_nc * (g_n @ scale^T)      [ld wide]
#     grad_scale  = sum_u (z_u * w_u) (x) g_u
#     grad_shift  = sum_u w_u * g_u
# Scattering [.., latent_dim] rows instead of [.., feature_dim] cuts the
# dominant backward cost by feature_dim/latent_dim (4x for the lego config)
# on the MXU one-hot scatter path.  The z rows needed for grad_scale ride
# along the forward gather for free (flat per-row gather cost).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def hash_encode_affine(coords, z, scale, shift, spec: HashGridSpec,
                       active_lods: Tuple[int, ...] = None):
    """Multi-LOD interpolation of ``z @ scale + shift``.

    Args:
        coords: [N, dim] in [-1, 1].
        z: [total_size, latent_dim] quantized+normalized latents.
        scale: [latent_dim, F] decode matrix.
        shift: [1, F] decode bias (pass zeros when unused).
        active_lods: static LOD subset to evaluate (None = all); output and
            grads cover only those LODs (the paged-encode path handles the
            rest, ops/paged_hash.py).
    Returns: [N, len(active_lods or L), F].
    """
    out, _ = _affine_fwd_impl(coords, z, scale, shift, spec, active_lods)
    return out


def _active(spec, active_lods):
    return tuple(range(spec.num_lods)) if active_lods is None else active_lods


def _affine_fwd_impl(coords, z, scale, shift, spec, active_lods=None):
    decoded = (z @ scale + shift).astype(jnp.float32)
    ld = z.shape[-1]
    both = jnp.concatenate([decoded, z.astype(jnp.float32)], axis=-1)
    feats, z_gathered, all_idx, all_w = [], [], [], []
    # NOTE: LODs gather with SEPARATE jnp.take calls on purpose — fusing the
    # hashed LODs into one take of [N, K*C] global indices makes XLA pick a
    # sublane-tiled layout for the [N, K, C, W] result with ~20x padding
    # (observed 18 GB HBM for the lego shapes).
    for lod in _active(spec, active_lods):
        res = spec.resolutions[lod]
        first = spec.lod_first_idx[lod]
        size = spec.lod_sizes[lod]
        table = jax.lax.dynamic_slice_in_dim(both, first, size, axis=0)
        if _brick_applicable(res, both.shape[-1], spec):
            gathered, idx, w = _brick_gather(table, coords, res, spec)
        else:
            idx, w = _lod_corner_indices_and_weights(coords, res, spec)
            gathered = jnp.take(table, idx, axis=0)        # [N, C, F+ld]
        feats.append(jnp.sum(gathered[..., :-ld] * w[..., None], axis=1))
        z_gathered.append(gathered[..., -ld:])
        all_idx.append(idx)
        all_w.append(w)
    out = jnp.stack(feats, axis=1)
    return out, (all_idx, all_w, z_gathered)


def _affine_fwd(coords, z, scale, shift, spec, active_lods):
    out, res = _affine_fwd_impl(coords, z, scale, shift, spec, active_lods)
    all_idx, all_w, z_gathered = res
    return out, (all_idx, all_w, z_gathered, scale, z[:0], shift[:0])


def _affine_bwd(spec, active_lods, residuals, g):
    from shacira_tpu.ops.pallas_scatter import scatter_add
    all_idx, all_w, z_gathered, scale, z_meta, shift_meta = residuals
    g = g.astype(jnp.float32)                              # [N, La, F]
    ld = scale.shape[0]
    f = scale.shape[1]
    grad_z_parts = {}
    grad_scale = jnp.zeros_like(scale, dtype=jnp.float32)
    grad_shift = jnp.zeros((1, f), jnp.float32)
    for li, lod in enumerate(_active(spec, active_lods)):
        idx, w = all_idx[li], all_w[li]                    # [N, C]
        gl = g[:, li, :]                                   # [N, F]
        gz = gl @ scale.astype(jnp.float32).T              # [N, ld]
        upd = (gz[:, None, :] * w[:, :, None]).reshape(-1, ld)
        grad_z_parts[lod] = scatter_add(idx.reshape(-1), upd,
                                        spec.lod_sizes[lod])
        zw = z_gathered[li] * w[..., None]                 # [N, C, ld]
        grad_scale = grad_scale + jnp.einsum('ncl,nf->lf', zw, gl)
        grad_shift = grad_shift + jnp.einsum('nc,nf->f', w, gl)[None]
    parts = [grad_z_parts.get(lod,
                              jnp.zeros((spec.lod_sizes[lod], ld),
                                        jnp.float32))
             for lod in range(spec.num_lods)]
    grad_z = jnp.concatenate(parts, axis=0).astype(z_meta.dtype)
    return (None, grad_z, grad_scale.astype(scale.dtype),
            grad_shift.astype(shift_meta.dtype))


hash_encode_affine.defvjp(_affine_fwd, _affine_bwd)


def hash_encode_flat(coords, codebook, spec: HashGridSpec):
    """Reference-layout output ``[N, L*F]`` (cu:106)."""
    out = hash_encode(coords, codebook, spec)
    n = out.shape[0]
    return out.reshape(n, spec.num_lods * codebook.shape[-1])


def hash_encode_naive(coords, codebook, spec: HashGridSpec):
    """Pure-XLA autodiff version (no custom VJP) for equivalence testing."""
    out, _ = _encode_fwd_impl(coords, codebook, spec)
    return out


# ---------------------------------------------------------------------------
# Static-coordinate plan: when the training coordinates are fixed (image INRs
# train on the full pixel grid every step — image_trainer.py 'static coords'
# fast path in the reference), both the gather indices AND the transposed
# scatter pattern are static.  We precompute:
#   * per-LOD corner indices + interpolation weights (forward gathers), and
#   * a padded "transpose plan": for every table slot, the (sample, corner)
#     pairs that touch it.  The backward then becomes a dense gather+reduce —
#     no scatter at all, fully vectorized and deterministic on TPU.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class StaticPlanMeta:
    spec: HashGridSpec
    num_coords: int
    bucket_ks: Tuple[int, ...]   # padded contributors-per-slot, per LOD


def build_static_plan(coords: np.ndarray, spec: HashGridSpec,
                      pad_multiple: int = 8):
    """Precompute forward indices and the backward transpose plan.

    Args:
        coords: [N, dim] float32 (host array; static for the whole training).
    Returns:
        (meta, arrays) where arrays is a pytree of device-ready numpy arrays:
          idx[l]   : [N, C] int32   — LOD-local corner indices
          w[l]     : [N, C] float32 — interpolation weights
          src[l]   : [S_l, K_l] int32 — flattened (n*C + c) contributor ids
          srcw[l]  : [S_l, K_l] float32 — contributor weights (0 = padding)
    """
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    c = 2 ** spec.dim
    arrays = {'idx': [], 'w': [], 'src': [], 'srcw': []}
    bucket_ks = []
    jcoords = jnp.asarray(coords)
    for lod, res in enumerate(spec.resolutions):
        idx, w = jax.jit(
            lambda cc, r=res: _lod_corner_indices_and_weights(cc, r, spec))(jcoords)
        idx = np.asarray(idx)
        w = np.asarray(w)
        size = spec.lod_sizes[lod]
        flat_idx = idx.reshape(-1)
        flat_w = w.reshape(-1)
        order = np.argsort(flat_idx, kind='stable')
        sorted_idx = flat_idx[order]
        counts = np.bincount(sorted_idx, minlength=size)
        k = int(counts.max()) if counts.size else 0
        k = max(pad_multiple, -(-k // pad_multiple) * pad_multiple)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        src = np.zeros((size, k), np.int32)
        srcw = np.zeros((size, k), np.float32)
        # place each slot's contributors into its padded row
        pos_in_bucket = np.arange(len(sorted_idx)) - starts[sorted_idx]
        src[sorted_idx, pos_in_bucket] = order.astype(np.int32)
        srcw[sorted_idx, pos_in_bucket] = flat_w[order]
        arrays['idx'].append(idx)
        arrays['w'].append(w)
        arrays['src'].append(src)
        arrays['srcw'].append(srcw)
        bucket_ks.append(k)
    meta = StaticPlanMeta(spec, n, tuple(bucket_ks))
    return meta, arrays


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def static_hash_encode(plan_arrays, codebook, meta: StaticPlanMeta):
    """Forward interpolation with precomputed indices (static coords).

    Returns [N, L, F]; gradients flow to ``codebook`` only.
    """
    return _static_fwd(plan_arrays, codebook, meta)


def _static_fwd(plan_arrays, codebook, meta):
    spec = meta.spec
    feats = []
    for lod in range(spec.num_lods):
        first = spec.lod_first_idx[lod]
        size = spec.lod_sizes[lod]
        table = jax.lax.dynamic_slice_in_dim(codebook, first, size, axis=0)
        gathered = jnp.take(table, plan_arrays['idx'][lod], axis=0)  # [N, C, F]
        f = jnp.sum(gathered.astype(jnp.float32)
                    * plan_arrays['w'][lod][..., None], axis=1)
        feats.append(f)
    return jnp.stack(feats, axis=1).astype(codebook.dtype)


def _static_encode_fwd(plan_arrays, codebook, meta):
    return _static_fwd(plan_arrays, codebook, meta), (plan_arrays, codebook[:0])


def _static_encode_bwd(meta, residuals, g):
    plan_arrays, cb_meta = residuals
    spec = meta.spec
    c = 2 ** spec.dim
    g = g.astype(jnp.float32)                     # [N, L, F]
    grads = []
    for lod in range(spec.num_lods):
        src = plan_arrays['src'][lod]             # [S, K] flat (n*C + corner)
        srcw = plan_arrays['srcw'][lod]           # [S, K]
        n_idx = src // c
        gl = jnp.take(g[:, lod, :], n_idx.reshape(-1), axis=0)
        gl = gl.reshape(src.shape + (g.shape[-1],))   # [S, K, F]
        grads.append(jnp.sum(gl * srcw[..., None], axis=1))  # [S, F]
    grad_cb = jnp.concatenate(grads, axis=0).astype(cb_meta.dtype)
    return None, grad_cb


static_hash_encode.defvjp(_static_encode_fwd, _static_encode_bwd)
