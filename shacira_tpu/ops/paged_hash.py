"""Spatially-paged hash-grid encode: block-local one-hot matmuls on the MXU.

The TPU-native answer to the reference's per-sample hash gathers
(`wisp/csrc/ops/hashgrid_interpolate_cuda.cu:143-309`): XLA row gathers cost
~6-10 ns each and the whole-table one-hot scatter has an N*T*F FLOPs floor,
which together cap NeRF training at ~9K rays/s.  This module breaks that wall
with a *paged* table layout (`HashGridSpec.hash_layout == 'paged'`):

    entry(cell) = page(cell) * E + (xor_hash(cell) & (E - 1))
    page(cell)  = coarse spatial bin of the cell (PAGE_RES**dim pages)

Corner entries of spatially close samples then land in a small, statically
bounded set of pages, so after grouping samples into blocks that share a
coarse *grouping cell* (GROUP_RES per axis; each block's corners provably lie
in the 4x4x4 page neighborhood of its cell), the encode becomes, per block:

    gather:  feats = sum_c w_c * onehot_E(entry_c) @ neigh[page_c]
    scatter: dNeigh += onehot_E(entry_c)^T @ (w_c * g masked to page_c)

— [E, B]x[E, 64*ld] MXU matmuls over VMEM-resident page neighborhoods,
~32K FLOPs per corner-row instead of a serialized HBM gather.  Neighborhoods
stream HBM->VMEM via a scalar-prefetched block index (consecutive blocks
sorted by cell reuse the resident neighborhood), and the backward accumulates
partials per grouping cell before one cheap one-hot reduction to pages.

Grouping happens once per training step at *segment* granularity (the
segmented raymarcher's 16-sample segments are spatially tight), so the sort
is over ~24K keys, not millions of samples.

Quality note: the paged layout is a different (but statistically equivalent)
hash function than the reference's — same table size, same expected collision
rate (verified empirically in tests/test_paged_hash.py).  It is opt-in via
``LatentGridConfig(hash_layout='paged')``.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shacira_tpu.ops.hashgrid import (
    HashGridSpec, PAGE_RES, PRIMES, _cell_and_frac, _corner_weights,
    paged_params, use_direct_index)

GROUP_RES = 8            # grouping cells per axis (= PAGE_RES // 2)
NEIGH = 4                # pages per axis in a block's neighborhood
N_CELLS = GROUP_RES ** 3
N_NEIGH = NEIGH ** 3     # 64


def lod_is_paged(res: int, spec: HashGridSpec) -> bool:
    """True when a LOD uses the paged fast path: hashed, divisible table,
    and fine enough that a grouping cell's 4^3 page neighborhood provably
    covers every corner (requires res >= 2 * PAGE_RES; see cover analysis
    in validate_paged_cover)."""
    return (spec.dim == 3 and spec.hash_layout == 'paged'
            and paged_params(res, spec.codebook_size, spec.dim) is not None
            and res >= 2 * PAGE_RES)


def paged_lods(spec: HashGridSpec):
    """(non_paged_lods, paged_lods) index tuples.  Paged LODs are always a
    suffix (resolutions ascend; the direct-index condition is monotone)."""
    flags = [lod_is_paged(r, spec) for r in spec.resolutions]
    pag = tuple(i for i, f in enumerate(flags) if f)
    non = tuple(i for i, f in enumerate(flags) if not f)
    if pag and (min(pag) < max(non + (-1,))):
        raise ValueError(f'paged LODs {pag} are not a suffix of {flags}')
    return non, pag


def validate_paged_cover(spec: HashGridSpec, seg_half01: float):
    """Raise unless every paged LOD's corner pages provably lie in the
    4^3 neighborhood of the sample's grouping cell.

    With x01 the segment center, samples within seg_half01, cell
    c = floor(x01*res) and page p = (c*16)//res, the corner pages span
    [2*c8-1, 2*c8+2] (c8 = floor(center*8)) iff
    ``16*seg_half01 + 16/res < 1`` (see module docstring analysis).
    """
    for res in spec.resolutions:
        if lod_is_paged(res, spec):
            margin = 2 * PAGE_RES * seg_half01 + PAGE_RES / res
            if margin >= 1.0:
                raise ValueError(
                    f'paged cover violated at res {res}: '
                    f'2*PAGE_RES*seg_half + PAGE_RES/res = {margin:.3f} >= 1; '
                    f'shorten segments or disable hash_layout=paged')


# ---------------------------------------------------------------------------
# Segment grouping
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _neighbor_pages_np(dim: int = 3):
    """Static [N_CELLS, N_NEIGH] map: grouping cell -> global page ids of its
    4^3 page neighborhood (pages 2*c-1 .. 2*c+2 per axis, clamped)."""
    cells = np.arange(N_CELLS)
    cx, cy, cz = cells // 64, (cells // 8) % 8, cells % 8
    out = np.zeros((N_CELLS, N_NEIGH), np.int32)
    for i in range(NEIGH):
        for j in range(NEIGH):
            for k in range(NEIGH):
                px = np.clip(2 * cx - 1 + i, 0, PAGE_RES - 1)
                py = np.clip(2 * cy - 1 + j, 0, PAGE_RES - 1)
                pz = np.clip(2 * cz - 1 + k, 0, PAGE_RES - 1)
                out[:, (i * NEIGH + j) * NEIGH + k] = (
                    px * PAGE_RES * PAGE_RES + py * PAGE_RES + pz)
    return out


def group_segments(centers01, live, segs_per_block: int, n_blocks: int):
    """Group live segments into blocks that share a grouping cell.

    Args:
        centers01: [K, 3] segment centers in [0, 1].
        live: [K] bool.
        segs_per_block: segments per kernel block (block rows B = this * G).
        n_blocks: static block capacity; needs ceil(K/spb) + N_CELLS to never
            overflow.
    Returns dict:
        slotseg_to_seg: [n_blocks*spb] int32 source segment per slot
            (K = padding sentinel).
        seg_to_slotseg: [K] int32 slot of each segment (dead -> n_slotseg).
        block_cell: [n_blocks] int32 grouping cell per block (N_CELLS for
            pad blocks).
        cell_used: [N_CELLS] bool.
    """
    k = centers01.shape[0]
    spb = segs_per_block
    n_slotseg = n_blocks * spb
    c = jnp.clip(jnp.floor(centers01 * GROUP_RES), 0, GROUP_RES - 1)
    c = c.astype(jnp.int32)
    cell = (c[:, 0] * GROUP_RES + c[:, 1]) * GROUP_RES + c[:, 2]
    key = jnp.where(live, cell, N_CELLS)
    skey, seg_order = jax.lax.sort_key_val(key, jnp.arange(k, dtype=jnp.int32))

    counts = jnp.zeros((N_CELLS + 1,), jnp.int32).at[key].add(1)
    blocks_per_cell = -(-counts[:N_CELLS] // spb)
    cum_blocks = jnp.cumsum(blocks_per_cell) - blocks_per_cell   # exclusive
    slot_base = cum_blocks * spb                                  # [N_CELLS]
    cum_counts = jnp.cumsum(counts) - counts                      # exclusive
    # rank of sorted segment within its cell
    rank = jnp.arange(k, dtype=jnp.int32) - cum_counts[skey]
    slot = jnp.where(skey < N_CELLS,
                     slot_base[jnp.minimum(skey, N_CELLS - 1)] + rank,
                     n_slotseg)
    slotseg_to_seg = jnp.full((n_slotseg,), k, jnp.int32)
    slotseg_to_seg = slotseg_to_seg.at[slot].set(seg_order, mode='drop')
    seg_to_slotseg = jnp.full((k,), n_slotseg, jnp.int32)
    seg_to_slotseg = seg_to_slotseg.at[seg_order].set(
        jnp.where(slot < n_slotseg, slot, n_slotseg), mode='drop')

    # cell of each block: from the cell of any segment in it, pad -> N_CELLS
    first_seg = slotseg_to_seg[::spb]                             # [n_blocks]
    has_seg = first_seg < k
    bcell = jnp.where(
        has_seg, key[jnp.minimum(first_seg, k - 1)], N_CELLS)
    return {'slotseg_to_seg': slotseg_to_seg,
            'seg_to_slotseg': seg_to_slotseg,
            'block_cell': bcell.astype(jnp.int32),
            'cell_used': counts[:N_CELLS] > 0}


def permute_rows(x, perm, inv_perm, out_len: int):
    """Differentiable row permutation-with-padding.

    fwd: ``out[i] = x[perm[i]]`` (perm[i] >= len(x) -> zeros); backward is a
    gather by ``inv_perm`` instead of a scatter (perm/inv_perm must be mutual
    inverses over the valid range).
    """
    return _permute_rows(x, perm, inv_perm, out_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _permute_rows(x, perm, inv_perm, out_len: int):
    n = x.shape[0]
    safe = jnp.minimum(perm, n - 1)
    out = jnp.take(x, safe, axis=0)
    return jnp.where((perm < n)[:, None], out, 0.0)


def _permute_rows_fwd(x, perm, inv_perm, out_len):
    return _permute_rows(x, perm, inv_perm, out_len), (inv_perm, x.shape[0])


def _permute_rows_bwd(out_len, res, g):
    inv_perm, n = res
    safe = jnp.minimum(inv_perm, g.shape[0] - 1)
    gx = jnp.take(g, safe, axis=0)
    gx = jnp.where((inv_perm < g.shape[0])[:, None], gx, 0.0)
    return gx[:n], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


# ---------------------------------------------------------------------------
# Per-LOD corner math (slot rows)
# ---------------------------------------------------------------------------

def _slot_corner_data(coords_s, block_cell, res: int, spec: HashGridSpec,
                      e: int):
    """entry/psel/w for slotted samples at one paged LOD.

    Args:
        coords_s: [NB, B, 3] slot coords in [-1, 1] (invalid slots arbitrary).
        block_cell: [NB] grouping cell per block.
    Returns:
        entry [NB, C, B] int32 in [0, E); psel [NB, C, B] int32 in [0, 64);
        w [NB, C, B] f32 (zero where invalid is handled by caller).
    """
    nb, b, _ = coords_s.shape
    flat = coords_s.reshape(nb * b, 3)
    pos, frac = _cell_and_frac(flat, res)
    w = _corner_weights(frac, spec)                       # [N, C]
    offs = jnp.asarray(spec.corner_offsets)
    cpos = pos[:, None, :] + offs[None, :, :]             # [N, C, 3]
    u = cpos.astype(jnp.uint32)
    acc = u[..., 0] * jnp.uint32(PRIMES[0])
    for d in range(1, 3):
        acc = acc ^ (u[..., d] * jnp.uint32(PRIMES[d]))
    entry = (acc & jnp.uint32(e - 1)).astype(jnp.int32)   # [N, C]
    pax = (cpos * PAGE_RES) // res                        # [N, C, 3]
    cc = block_cell[:, None].repeat(b, 1).reshape(nb * b)
    c3 = jnp.stack([cc // 64, (cc // 8) % 8, cc % 8], -1)  # [N, 3]
    ps = pax - (2 * c3[:, None, :] - 1)
    ps = jnp.clip(ps, 0, NEIGH - 1)
    psel = (ps[..., 0] * NEIGH + ps[..., 1]) * NEIGH + ps[..., 2]
    to_blk = lambda a: a.reshape(nb, b, -1).transpose(0, 2, 1)
    return (to_blk(entry).astype(jnp.int32), to_blk(psel).astype(jnp.int32),
            to_blk(w))


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _gather_kernel(bc_ref, ent_ref, psel_ref, w_ref, neigh_ref, out_ref, *,
                   C, B, E, LD, dtype):
    # one fused [E, C*B] one-hot against the block's neighborhood: a single
    # MXU contraction instead of C small ones (C=8 corners)
    neigh = neigh_ref[0].astype(dtype)                    # [E, LD*64]
    ent = ent_ref[0].reshape(C * B)                       # corner-major
    psel = psel_ref[0].reshape(C * B)
    w = w_ref[0].reshape(C * B)
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (E, C * B), 0)
    a = (ent[None, :] == e_iota).astype(dtype)            # [E, C*B]
    g = jax.lax.dot_general(neigh, a, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (N_NEIGH, C * B), 0)
    m = (psel[None, :] == p_iota).astype(jnp.float32)     # [64, C*B]
    accs = []
    for l in range(LD):
        sel = jnp.sum(g[l * N_NEIGH:(l + 1) * N_NEIGH, :] * m, axis=0)
        accs.append(jnp.sum((w * sel).reshape(C, B), axis=0))
    out_ref[0] = jnp.stack(accs)                          # [LD, B]


def _scatter_kernel(bc_ref, ent_ref, psel_ref, w_ref, g_ref, out_ref, *,
                    C, B, E, LD, dtype):
    i = pl.program_id(0)
    prev = bc_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (bc_ref[i] != prev)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # fused corners: one [E, C*B] x [C*B, LD*64] MXU contraction
    ent = ent_ref[0].reshape(C * B)
    psel = psel_ref[0].reshape(C * B)
    w = w_ref[0].reshape(C * B)
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (E, C * B), 0)
    a = (ent[None, :] == e_iota).astype(dtype)            # [E, C*B]
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (N_NEIGH, C * B), 0)
    m = (psel[None, :] == p_iota).astype(jnp.float32)     # [64, C*B]
    rows = []
    for l in range(LD):
        gl = (jnp.broadcast_to(g_ref[0, l, :][None, :], (C, B))
              .reshape(C * B) * w)
        rows.append(m * gl[None, :])                      # [64, C*B]
    dg = jnp.concatenate(rows, axis=0).astype(dtype)      # [LD*64, C*B]
    out_ref[0] += jax.lax.dot_general(
        a, dg, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [E, LD*64]


def _neigh_table(table, e: int, ld: int):
    """[cs, ld] table -> [N_CELLS+1, E, LD*64] per-grouping-cell page
    neighborhoods in kernel column layout (col = l*64 + neighbor_slot)."""
    p = table.shape[0] // e
    pages = table.reshape(p, e * ld)
    ncell = jnp.asarray(_neighbor_pages_np())             # [512, 64]
    ncell = jnp.concatenate(
        [ncell, jnp.zeros((1, N_NEIGH), jnp.int32)], axis=0)
    neigh = jnp.take(pages, ncell.reshape(-1), axis=0)
    neigh = neigh.reshape(N_CELLS + 1, N_NEIGH, e, ld)
    return neigh.transpose(0, 2, 3, 1).reshape(N_CELLS + 1, e, ld * N_NEIGH)


def _paged_interp_lod_fwd_impl(coords_s, block_cell, table, res: int,
                               spec: HashGridSpec, interpret: bool,
                               dtype):
    nb, b, _ = coords_s.shape
    cs = spec.codebook_size
    _, e = paged_params(res, cs, 3)
    ld = table.shape[-1]
    c = 2 ** spec.dim
    ent, psel, w = _slot_corner_data(coords_s, block_cell, res, spec, e)
    neigh = _neigh_table(table, e, ld)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, C=c, B=b, E=e, LD=ld, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, c, b), lambda i, bc: (i, 0, 0)),
                pl.BlockSpec((1, c, b), lambda i, bc: (i, 0, 0)),
                pl.BlockSpec((1, c, b), lambda i, bc: (i, 0, 0)),
                pl.BlockSpec((1, e, ld * N_NEIGH),
                             lambda i, bc: (bc[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, ld, b), lambda i, bc: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, ld, b), jnp.float32),
        interpret=interpret,
    )(block_cell, ent, psel, w, neigh)
    return out, (ent, psel, w)


def _paged_interp_lod_bwd_impl(ent, psel, w, g_blocks, block_cell, cell_used,
                               res: int, spec: HashGridSpec, ld: int,
                               interpret: bool, dtype):
    """g_blocks [NB, LD, B] -> grad table [cs, ld] (f32)."""
    from shacira_tpu.ops import pallas_scatter
    nb, c, b = ent.shape
    cs = spec.codebook_size
    p, e = paged_params(res, cs, 3)
    partials = pl.pallas_call(
        functools.partial(_scatter_kernel, C=c, B=b, E=e, LD=ld, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, c, b), lambda i, bc: (i, 0, 0)),
                pl.BlockSpec((1, c, b), lambda i, bc: (i, 0, 0)),
                pl.BlockSpec((1, c, b), lambda i, bc: (i, 0, 0)),
                pl.BlockSpec((1, ld, b), lambda i, bc: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, e, ld * N_NEIGH),
                                   lambda i, bc: (bc[i], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((N_CELLS + 1, e, ld * N_NEIGH),
                                       jnp.float32),
        interpret=interpret,
    )(block_cell, ent, psel, w, g_blocks)
    # unvisited cells hold garbage — mask, then reduce neighborhoods to pages
    mask = jnp.concatenate([cell_used, jnp.zeros((1,), bool)])
    partials = jnp.where(mask[:, None, None], partials[:N_CELLS + 1], 0.0)
    partials = partials[:N_CELLS]
    rows = partials.reshape(N_CELLS, e, ld, N_NEIGH).transpose(0, 3, 1, 2)
    rows = rows.reshape(N_CELLS * N_NEIGH, e * ld)
    dst = jnp.asarray(_neighbor_pages_np()).reshape(-1)
    grad_pages = pallas_scatter.onehot_scatter_add(
        dst, rows, p, interpret=interpret, compute_dtype=jnp.float32)
    return grad_pages.reshape(cs, ld)


# ---------------------------------------------------------------------------
# Public multi-LOD interp with custom VJP
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PagedStatic:
    """Static closure for paged_interp_lods (hashable; nondiff)."""
    spec: HashGridSpec
    lods: tuple            # paged LOD indices
    interpret: bool = False
    use_bf16: bool = True

    @property
    def dtype(self):
        return jnp.bfloat16 if self.use_bf16 else jnp.float32


def default_static(spec, interpret: bool = None, use_bf16: bool = True):
    _, pag = paged_lods(spec)
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ('tpu', 'axon')
        except Exception:
            interpret = True
    return PagedStatic(spec=spec, lods=pag, interpret=interpret,
                       use_bf16=use_bf16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def paged_interp_lods(coords_s, slot_valid, block_cell, cell_used, z,
                      static: PagedStatic):
    """Interpolate the paged LODs' latents at slotted sample coords.

    Args:
        coords_s: [NS, 3] slot coords in [-1, 1] (NS = n_blocks * B).
        slot_valid: [NS] bool.
        block_cell: [n_blocks] int32 grouping cell (N_CELLS for pads).
        cell_used: [N_CELLS] bool.
        z: [total_size, ld] full codebook (only paged LOD ranges are read;
            grads are zero elsewhere).
        static: PagedStatic (spec, paged lod indices, interpret/dtype).
    Returns:
        [NS, n_paged, ld] f32 interpolated latents (invalid slots zero).
    """
    out, _ = _paged_fwd_impl(coords_s, slot_valid, block_cell, cell_used, z,
                             static)
    return out


def _paged_fwd_impl(coords_s, slot_valid, block_cell, cell_used, z, static):
    spec = static.spec
    nb = block_cell.shape[0]
    ns = coords_s.shape[0]
    b = ns // nb
    ld = z.shape[-1]
    cs3 = coords_s.reshape(nb, b, 3)
    outs, residuals = [], []
    for lod in static.lods:
        res = spec.resolutions[lod]
        first = spec.lod_first_idx[lod]
        size = spec.lod_sizes[lod]
        table = jax.lax.dynamic_slice_in_dim(z, first, size, axis=0)
        out, (ent, psel, w) = _paged_interp_lod_fwd_impl(
            cs3, block_cell, table, res, spec, static.interpret,
            static.dtype)
        w = w * slot_valid.reshape(nb, b).astype(jnp.float32)[:, None, :]
        # recompute fwd masking: invalid slots must produce zeros
        out = out * slot_valid.reshape(nb, b).astype(
            jnp.float32)[:, None, :]
        outs.append(out.transpose(0, 2, 1).reshape(ns, ld))
        residuals.append((ent, psel, w))
    stacked = jnp.stack(outs, axis=1) if outs else jnp.zeros((ns, 0, ld))
    return stacked, residuals


def _paged_fwd(coords_s, slot_valid, block_cell, cell_used, z, static):
    out, residuals = _paged_fwd_impl(coords_s, slot_valid, block_cell,
                                     cell_used, z, static)
    # zero-size slice keeps z's dtype as a jax-typed residual
    return out, (residuals, block_cell, cell_used, z[:0])


def _paged_bwd(static, saved, g):
    residuals, block_cell, cell_used, z_meta = saved
    zdtype = z_meta.dtype
    spec = static.spec
    nb = block_cell.shape[0]
    grads = []
    pieces = {}
    for li, lod in enumerate(static.lods):
        ent, psel, w = residuals[li]
        _, c, b = ent.shape
        ld = g.shape[-1]
        gl = g[:, li, :].reshape(nb, b, ld).transpose(0, 2, 1)  # [NB, LD, B]
        gl = gl.astype(jnp.float32)
        gt = _paged_interp_lod_bwd_impl(
            ent, psel, w, gl, block_cell, cell_used,
            spec.resolutions[lod], spec, ld, static.interpret, static.dtype)
        pieces[lod] = gt
    # assemble full-codebook grad (zeros outside paged LOD ranges)
    ld = g.shape[-1]
    parts = []
    for lod in range(spec.num_lods):
        if lod in pieces:
            parts.append(pieces[lod])
        else:
            parts.append(jnp.zeros((spec.lod_sizes[lod], ld), jnp.float32))
    grad_z = jnp.concatenate(parts, axis=0).astype(zdtype)
    return None, None, None, None, grad_z


paged_interp_lods.defvjp(_paged_fwd, _paged_bwd)
