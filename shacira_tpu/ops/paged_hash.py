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
    HashGridSpec, PAGE_RES, PRIMES, SMALL_PAGE_ENTRIES, paged_params,
    use_direct_index)

# Geometry is derived from the spec's page_res (see HashGridSpec.page_res):
#   group_res = page_res // 2   (grouping cells per axis; 2 pages per cell)
#   NEIGH = 4                   (pages per axis in a block's neighborhood:
#                                the cell's 2 plus a 1-page margin each side)
# The module-level constants below are the page_res=16 defaults, kept for
# callers that never touch a non-default geometry.
GROUP_RES = 8
NEIGH = 4
N_CELLS = GROUP_RES ** 3
N_NEIGH = NEIGH ** 3     # 64


def group_res_of(page_res: int) -> int:
    return page_res // 2


def n_cells_of(page_res: int) -> int:
    return group_res_of(page_res) ** 3


DIRECT_MARGIN = 1.0 / 32.0  # static seg-cover slack for direct-LOD slabs
                            # ([0,1] coords); callers validate seg_half01
                            # against it (validate_paged_cover)


def lod_is_paged(res: int, spec: HashGridSpec) -> bool:
    """True when a LOD uses the paged fast path: hashed, divisible table,
    and fine enough that a grouping cell's 4^3 page neighborhood provably
    covers every corner (requires res >= 2 * spec.page_res; see cover
    analysis in validate_paged_cover)."""
    return (spec.dim == 3 and spec.hash_layout == 'paged'
            and paged_params(res, spec.codebook_size, spec.dim,
                             spec.page_res) is not None
            and res >= 2 * spec.page_res)


def paged_lods(spec: HashGridSpec):
    """(non_paged_lods, paged_lods) index tuples.  Paged LODs are always a
    suffix (resolutions ascend; the direct-index condition is monotone)."""
    flags = [lod_is_paged(r, spec) for r in spec.resolutions]
    pag = tuple(i for i, f in enumerate(flags) if f)
    non = tuple(i for i, f in enumerate(flags) if not f)
    if pag and (min(pag) < max(non + (-1,))):
        raise ValueError(f'paged LODs {pag} are not a suffix of {flags}')
    return non, pag


def blocklocal_lods(spec: HashGridSpec):
    """(rest, direct, paged) LOD index tuples.  ``direct`` (dense tables) and
    ``paged`` (hashed, page-divisible) LODs run inside the block-local
    kernels; ``rest`` (hashed but unpageable) need the plain XLA path."""
    non, pag = paged_lods(spec)
    direct = tuple(l for l in non if use_direct_index(
        spec.resolutions[l], spec.codebook_size, spec.dim))
    rest = tuple(l for l in non if l not in direct)
    return rest, direct, pag


def validate_paged_cover(spec: HashGridSpec, seg_half01: float):
    """Raise unless every paged LOD's corner pages provably lie in the
    4^3 neighborhood of the sample's grouping cell.

    With x01 the segment center, samples within seg_half01, cell
    c = floor(x01*res) and page p = (c*P)//res (P = spec.page_res), the
    corner pages span [2*cg-1, 2*cg+2] (cg = floor(center*(P/2))) iff
    ``P*seg_half01 + P/res < 1`` (see module docstring analysis).
    """
    p = spec.page_res
    for res in spec.resolutions:
        if lod_is_paged(res, spec):
            margin = 2 * p * seg_half01 + p / res
            if margin >= 1.0:
                raise ValueError(
                    f'paged cover violated at res {res}: '
                    f'2*page_res*seg_half + page_res/res = {margin:.3f} >= 1; '
                    f'shorten segments, lower page_res, or disable '
                    f'hash_layout=paged')
    if seg_half01 > DIRECT_MARGIN:
        raise ValueError(
            f'segment half-length {seg_half01:.4f} (01 coords) exceeds the '
            f'direct-LOD slab margin {DIRECT_MARGIN}; shorten segments or '
            f'disable hash_layout=paged')


# ---------------------------------------------------------------------------
# Direct-LOD slabs: dense per-grouping-cell subboxes
# ---------------------------------------------------------------------------

def direct_slab_width(res: int, margin: float = DIRECT_MARGIN,
                      group_res: int = GROUP_RES) -> int:
    """Cells per axis of a grouping cell's subbox window at a direct LOD:
    covers every corner cell of any sample within ``margin`` of the cell
    (span (1/group_res + 2*margin)*res, +1 for the floor straddle,
    +1 corner)."""
    return min(int(np.ceil(res * (1.0 / group_res + 2.0 * margin))) + 2, res)


@functools.lru_cache(maxsize=None)
def _slab_starts_np(res: int, margin: float = DIRECT_MARGIN,
                    group_res: int = GROUP_RES):
    """([group_res] int32 window starts per axis, width) for a direct LOD.
    start[c] <= any corner cell of cell c's samples < start[c] + w."""
    w = direct_slab_width(res, margin, group_res)
    c = np.arange(group_res)
    lo = np.floor((c / group_res - margin) * res).astype(np.int64)
    return np.clip(lo, 0, res - w).astype(np.int32), w


def _slab_tables(table, res: int, ld: int, margin: float,
                 group_res: int = GROUP_RES, dtype=None):
    """Dense direct-LOD table [res**3, ld] -> per-grouping-cell subbox slabs
    [n_cells + 1, w*w, ld*w] in kernel layout (row = ly*w + lz,
    col = d*w + lx; pad cell = zeros).  Three axis-gathers of group_res*w
    static rows each — no per-sample gathers.  ``dtype`` (the kernel's
    compute dtype) casts before the expansion: the slabs duplicate table
    rows ~8-30x, and the device streams ~93 GB/s, so building them bf16
    halves a measurable slice of the step."""
    if dtype is not None:
        table = table.astype(dtype)
    starts, w = _slab_starts_np(res, margin, group_res)
    ix = jnp.asarray(starts[:, None] + np.arange(w)[None, :])   # [g, w]
    g8 = group_res
    t = table.reshape(res, res, res, ld)                        # [z, y, x, ld]
    t = jnp.take(t, ix.reshape(-1), axis=0).reshape(g8, w, res, res, ld)
    t = jnp.take(t, ix.reshape(-1), axis=2).reshape(g8, w, g8, w, res, ld)
    t = jnp.take(t, ix.reshape(-1), axis=4).reshape(g8, w, g8, w, g8, w, ld)
    # [cz, lz, cy, ly, cx, lx, ld] -> [cx, cy, cz, ly, lz, ld, lx]
    t = t.transpose(4, 2, 0, 3, 1, 6, 5)
    t = t.reshape(g8 ** 3, w * w, ld * w)
    return jnp.concatenate(
        [t, jnp.zeros((1, w * w, ld * w), t.dtype)], axis=0)


@functools.lru_cache(maxsize=None)
def _fold_window_matrix_np(res: int, margin: float, group_res: int):
    """Static 0/1 fold matrix F [res, group_res*w]: F[r, c*w + l] = 1 iff
    window cell (c, l) reads table row r (r = starts[c] + l)."""
    starts, w = _slab_starts_np(res, margin, group_res)
    src = (starts[:, None] + np.arange(w)[None, :]).reshape(-1)
    f = np.zeros((res, group_res * w), np.float32)
    f[src, np.arange(group_res * w)] = 1.0
    return f


def _slab_grad_to_table(gslab, res: int, ld: int, margin: float,
                        group_res: int = GROUP_RES):
    """[n_cells + 1, w*w, ld*w] slab grads -> dense table grad [res**3, ld].

    The axis-separable overlap-add runs as three MXU contractions with a
    static 0/1 fold matrix (exact f32 adds) — measured several times faster
    than scatter-add + transpose chains on this stack (the chains are
    layout/latency-bound, not bandwidth-bound)."""
    starts, w = _slab_starts_np(res, margin, group_res)
    fm = jnp.asarray(_fold_window_matrix_np(res, margin, group_res))
    fm = fm.reshape(res, group_res, w)
    g8 = group_res
    g = gslab[:g8 ** 3].reshape(g8, g8, g8, w, w, ld, w).astype(jnp.float32)
    # dims: [cx, cy, cz, ly, lz, ld, lx]
    hi = jax.lax.Precision.HIGHEST
    g = jax.lax.dot_general(fm, g, (((1, 2), (0, 6)), ((), ())),
                            precision=hi)       # [x, cy, cz, ly, lz, ld]
    g = jax.lax.dot_general(fm, g, (((1, 2), (1, 3)), ((), ())),
                            precision=hi)       # [y, x, cz, lz, ld]
    g = jax.lax.dot_general(fm, g, (((1, 2), (2, 3)), ((), ())),
                            precision=hi)       # [z, y, x, ld]
    return g.reshape(res ** 3, ld)


# ---------------------------------------------------------------------------
# In-kernel corner math
#
# ent/psel/w for every (corner, slot) pair are recomputed INSIDE the Pallas
# kernels from the block's raw coords ([3, B] per block) instead of being
# precomputed by XLA and streamed through HBM: at lego shapes the per-corner
# arrays are [NB, L, C, B] x3 x int32/f32 ~ 0.5 GB per direction, while the
# coords are 1.5 MB.  The VPU cost of the recompute (~20 ops per corner-row)
# is well below the one-hot build the kernel already does.
# ---------------------------------------------------------------------------

def _kernel_pos_frac(coords3, res: int):
    """Per-axis cell/frac for one LOD; coords3 = 3 x [B] f32.

    Must match hashgrid._cell_and_frac bit-for-bit (same f32 formula)."""
    pos, frac = [], []
    for d in range(3):
        x = jnp.clip(res * (coords3[d] * 0.5 + 0.5), 0.0, res - 1 - 1e-5)
        p = jnp.minimum(jnp.floor(x), max(res - 2, 0))
        frac.append(jnp.clip(x - p, 0.0, 1.0))
        pos.append(p.astype(jnp.int32))
    return pos, frac


def _kernel_corner_pos_w(pos, frac):
    """Corner cell positions (3 x [C, B] int32) + trilinear weights [C, B].

    Corner j's axis-d offset is ``(j >> (2 - d)) & 1`` (reference bit
    order); offsets come from an iota so the kernel captures no constants."""
    b = pos[0].shape[0]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (8, b), 0)         # [C, B]
    cp, wgt = [], None
    for d in range(3):
        off = (cidx >> (2 - d)) & 1
        cp.append(pos[d][None, :] + off)
        wd = jnp.where(off > 0, frac[d][None, :], 1.0 - frac[d][None, :])
        wgt = wd if wgt is None else wgt * wd
    return cp, wgt


def _kernel_paged_corners(coords3, c3, res: int, e: int,
                          page_res: int = PAGE_RES):
    """In-kernel entry/psel/w at one paged LOD ([C, B] each).

    Reproduces _cell_and_frac + the XOR-prime entry hash (incl. the
    small-page bit folding, hashgrid.fold_hash) + the page-relative
    4^3 neighborhood select (psel) of the host reference exactly.  The
    ``(cpos * page_res) // res`` page index is computed as an f32 floor-div
    with the numerator nudged by +0.5: exact quotients sit 0.5/res above an
    integer and non-multiples stay >= 0.5/res below the next one, so the
    floor is robust even when the divide lowers to a reciprocal multiply
    (Mosaic does; the bare division floors exact multiples down by one at
    e.g. res 132/154)."""
    pos, frac = _kernel_pos_frac(coords3, res)
    cp, wgt = _kernel_corner_pos_w(pos, frac)
    acc = cp[0].astype(jnp.uint32) * jnp.uint32(PRIMES[0])
    for d in range(1, 3):
        acc = acc ^ (cp[d].astype(jnp.uint32) * jnp.uint32(PRIMES[d]))
    if e < SMALL_PAGE_ENTRIES:           # mirror hashgrid.fold_hash
        acc = acc ^ (acc >> jnp.uint32(8)) ^ (acc >> jnp.uint32(16)) \
            ^ (acc >> jnp.uint32(24))
    ent = (acc & jnp.uint32(e - 1)).astype(jnp.int32)
    psel = None
    for d in range(3):
        pax = jnp.floor((cp[d].astype(jnp.float32) * jnp.float32(page_res)
                         + 0.5) / jnp.float32(res))
        ps = jnp.clip(pax.astype(jnp.int32) - (2 * c3[d] - 1), 0, NEIGH - 1)
        psel = ps if psel is None else psel * NEIGH + ps
    return ent, psel, wgt


def _kernel_slab_start(c, res: int, w: int, g: int, margin: float, starts):
    """Scalar slab-window start for grouping-cell coordinate ``c``.

    Reproduces the host table (_slab_starts_np) with exact integer
    arithmetic when margin is a multiple of 1/32 (the default):
    ``floor((c/g - margin)*res) = floor((c*(32/g) - 32*margin)*res / 32)``
    — 3 scalar int ops per axis instead of a ``group_res``-way select
    cascade (the cascade measurably serializes the kernel on the scalar
    core at group_res 16).  ``starts`` stays as the fallback for
    non-dyadic margins."""
    m32 = margin * 32
    if 32 % g == 0 and abs(m32 - round(m32)) < 1e-9:
        st = ((c * (32 // g) - int(round(m32))) * res) // 32
        return jnp.clip(st, 0, res - w)
    st = jnp.int32(starts[0])
    for cv in range(1, len(starts)):
        st = jnp.where(c == cv, jnp.int32(starts[cv]), st)
    return st


def _kernel_direct_folded(coords3, c3, res: int, starts, w: int,
                          g: int = GROUP_RES, margin: float = DIRECT_MARGIN):
    """Corner-folded direct-LOD lookup data: per-AXIS 2-hot weight vectors
    instead of 8 corner rows.

    Trilinear interpolation over a dense slab is separable — the weighted
    sum over the 8 corners is the tensor product of three per-axis
    (1-frac, frac) pairs — so instead of expanding samples to 8 corner rows
    (streaming 8x the columns through the one-hot matmul and page select,
    as the hashed LODs must), the kernel folds the corners into a *weighted*
    one-hot: ``by``/``bz`` combine into a [w*w, B] row matrix with at most
    4 nonzeros per column and ``mx`` 2-hot-selects the x pair after the
    contraction.  ~8x fewer MXU-streamed columns and ~10x cheaper one-hot
    construction than the corner-expanded form, exact in f32 (weight
    products merely reassociate).

    Returns (by, bz, mx): [w, B] f32 each; by[r,b] = (r==ly)*(1-fy) +
    (r==ly+1)*fy with the same defensive index clipping as the corner path
    (clip collisions sum the weights, matching the corner-expanded math).
    """
    pos, frac = _kernel_pos_frac(coords3, res)
    b = pos[0].shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, b), 0)
    out = []
    for d in range(3):
        st = _kernel_slab_start(c3[d], res, w, g, margin, starts)
        lb = pos[d] - st
        i0 = jnp.clip(lb, 0, w - 1)[None]
        i1 = jnp.clip(lb + 1, 0, w - 1)[None]
        f = frac[d][None]
        out.append((iota == i0).astype(jnp.float32) * (1.0 - f)
                   + (iota == i1).astype(jnp.float32) * f)
    mx, by, bz = out                  # axis order (x, y, z)
    return by, bz, mx


# ---------------------------------------------------------------------------
# In-kernel fine occupancy (a bit-packed pseudo-LOD)
#
# The per-sample fine occupancy query is gather-latency-bound in XLA
# (~5 ms at lego eval shapes).  The paged kernels already hold every
# sample's coords, so occupancy rides them as one more block-local window:
# occupancy bits packed 8-per-byte along z, sliced into per-grouping-cell
# subboxes (rows = (x, z-byte), lanes = y), NEAREST-selected with one-hot
# factors (same folded machinery as the direct LODs, without the +1 corner
# or weights), and the bit extracted with exact power-of-two arithmetic.
# The slab depends only on the occupancy grid, so trainers build it once
# per prune.
# ---------------------------------------------------------------------------

def occ_slab_width(res: int, margin: float = DIRECT_MARGIN,
                   group_res: int = GROUP_RES):
    """(cell-window width w, z-byte window width wb) of the occupancy slab.

    Unlike interpolated LODs there is no +1 corner: the query touches only
    the sample's own cell, so the width drops the corner straddle (+1
    stays for the floor straddle)."""
    w = min(int(np.ceil(res * (1.0 / group_res + 2.0 * margin))) + 1, res)
    return w, (w + 6) // 8 + 1


def occ_slab_tables(occ, margin: float = DIRECT_MARGIN,
                    group_res: int = GROUP_RES, dtype=jnp.float32):
    """Occupancy grid [res, res, res] bool (layout [x, y, z], the
    accel.occupancy convention) -> per-grouping-cell bit-packed slabs
    [n_cells + 1, w*wb, w] (row = lx*wb + lzb, lane = ly; byte value =
    sum_k occ[..., 8*zb+k] << k).  Built once per prune."""
    res = occ.shape[0]
    w, wb = occ_slab_width(res, margin, group_res)
    resb = res // 8
    powers = jnp.asarray(2.0 ** np.arange(8), jnp.float32)
    occb = (occ.reshape(res, res, resb, 8).astype(jnp.float32)
            * powers).sum(-1)                            # [x, y, zb]
    # z-byte window can poke one byte past resb at the largest starts
    occb = jnp.concatenate(
        [occb, jnp.zeros((res, res, 1), jnp.float32)], axis=-1)
    # cell-window starts with the occupancy width (clip range differs
    # from the interpolation slabs')
    c = np.arange(group_res)
    lo = np.floor((c / group_res - margin) * res).astype(np.int64)
    st = np.clip(lo, 0, res - w).astype(np.int32)
    ix = jnp.asarray(st[:, None] + np.arange(w)[None, :])      # [g, w]
    izb = jnp.asarray((st >> 3)[:, None] + np.arange(wb)[None, :])  # [g, wb]
    g8 = group_res
    t = jnp.take(occb, ix.reshape(-1), axis=0).reshape(g8, w, res, resb + 1)
    t = jnp.take(t, ix.reshape(-1), axis=2).reshape(g8, w, g8, w, resb + 1)
    t = jnp.take(t, izb.reshape(-1), axis=4).reshape(g8, w, g8, w, g8, wb)
    # [cx, lx, cy, ly, cz, lzb] -> [cx, cy, cz, lx, lzb, ly]
    t = t.transpose(0, 2, 4, 1, 5, 3).reshape(g8 ** 3, w * wb, w)
    t = jnp.concatenate([t, jnp.zeros((1, w * wb, w), t.dtype)], axis=0)
    return t.astype(dtype)


def _kernel_occ_starts(c3, res: int, w: int, g: int, margin: float):
    """Scalar occupancy-window starts (cell space) per axis; mirrors the
    host starts in occ_slab_tables (same floor formula, clip to res-w)."""
    outs = []
    m32 = margin * 32
    assert 32 % g == 0 and abs(m32 - round(m32)) < 1e-9, \
        'occupancy slab needs a dyadic margin'
    for d in range(3):
        st = ((c3[d] * (32 // g) - int(round(m32))) * res) // 32
        outs.append(jnp.clip(st, 0, res - w))
    return outs


def _kernel_occ_query(coords3, c3, slab, res: int, w: int, wb: int,
                      g: int, margin: float, dtype):
    """In-kernel per-sample fine occupancy (see module section above).

    Must match accel.occupancy.query bit-for-bit: cell =
    floor(clip((c*0.5+0.5)*res, 0, res-1e-5)), AND inside the unit cube.
    Returns [B] f32 in {0., 1.}."""
    b = coords3[0].shape[0]
    pos, inside = [], None
    for d in range(3):
        x = jnp.clip((coords3[d] * 0.5 + 0.5) * res, 0.0, res - 1e-5)
        pos.append(jnp.floor(x).astype(jnp.int32))
        ok = (coords3[d] >= -1.0) & (coords3[d] <= 1.0)
        inside = ok if inside is None else (inside & ok)
    st = _kernel_occ_starts(c3, res, w, g, margin)
    lx = jnp.clip(pos[0] - st[0], 0, w - 1)
    ly = jnp.clip(pos[1] - st[1], 0, w - 1)
    lzb = jnp.clip((pos[2] >> 3) - (st[2] >> 3), 0, wb - 1)
    bit = pos[2] & 7
    iw = jax.lax.broadcasted_iota(jnp.int32, (w, b), 0)
    iwb = jax.lax.broadcasted_iota(jnp.int32, (wb, b), 0)
    bx = (iw == lx[None, :]).astype(jnp.float32)          # [w, B]
    bzb = (iwb == lzb[None, :]).astype(jnp.float32)       # [wb, B]
    my = (iw == ly[None, :]).astype(jnp.float32)          # [w, B]
    bmat = (bx[:, None, :] * bzb[None, :, :]).reshape(w * wb, b)
    v = jax.lax.dot_general(slab.astype(dtype), bmat.astype(dtype),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_precision(dtype))   # [w(ly), B]
    byte = jnp.sum(v * my, axis=0)                        # [B] 0..255 exact
    # exact 2^-bit via exponent bits; byte values < 256 are exact in bf16
    shift = jax.lax.bitcast_convert_type(
        (jnp.int32(127) - bit) << 23, jnp.float32)
    u = jnp.floor(byte * shift)
    occv = u - 2.0 * jnp.floor(u * 0.5)
    return occv * inside.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Segment grouping
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _neighbor_pages_np(dim: int = 3, page_res: int = PAGE_RES):
    """Static [n_cells, N_NEIGH] map: grouping cell -> global page ids of its
    4^3 page neighborhood (pages 2*c-1 .. 2*c+2 per axis, clamped)."""
    g = group_res_of(page_res)
    cells = np.arange(g ** 3)
    cx, cy, cz = cells // (g * g), (cells // g) % g, cells % g
    out = np.zeros((g ** 3, N_NEIGH), np.int32)
    for i in range(NEIGH):
        for j in range(NEIGH):
            for k in range(NEIGH):
                px = np.clip(2 * cx - 1 + i, 0, page_res - 1)
                py = np.clip(2 * cy - 1 + j, 0, page_res - 1)
                pz = np.clip(2 * cz - 1 + k, 0, page_res - 1)
                out[:, (i * NEIGH + j) * NEIGH + k] = (
                    px * page_res * page_res + py * page_res + pz)
    return out


def group_segments(centers01, live, segs_per_block: int, n_blocks: int,
                   group_res: int = GROUP_RES):
    """Group live segments into blocks that share a grouping cell.

    Args:
        centers01: [K, 3] segment centers in [0, 1].
        live: [K] bool.
        segs_per_block: segments per kernel block (block rows B = this * G).
        n_blocks: static block capacity; needs ceil(K/spb) + n_cells to never
            overflow (n_cells = group_res**3).
    Returns dict:
        slotseg_to_seg: [n_blocks*spb] int32 source segment per slot
            (K = padding sentinel).
        seg_to_slotseg: [K] int32 slot of each segment (dead -> n_slotseg).
        block_cell: [n_blocks] int32 grouping cell per block (n_cells for
            pad blocks).
        cell_used: [n_cells] bool.
    """
    k = centers01.shape[0]
    spb = segs_per_block
    n_cells = group_res ** 3
    n_slotseg = n_blocks * spb
    c = jnp.clip(jnp.floor(centers01 * group_res), 0, group_res - 1)
    c = c.astype(jnp.int32)
    cell = (c[:, 0] * group_res + c[:, 1]) * group_res + c[:, 2]
    key = jnp.where(live, cell, n_cells)
    skey, seg_order = jax.lax.sort_key_val(key, jnp.arange(k, dtype=jnp.int32))

    counts = jnp.zeros((n_cells + 1,), jnp.int32).at[key].add(1)
    blocks_per_cell = -(-counts[:n_cells] // spb)
    cum_blocks = jnp.cumsum(blocks_per_cell) - blocks_per_cell   # exclusive
    slot_base = cum_blocks * spb                                  # [n_cells]
    cum_counts = jnp.cumsum(counts) - counts                      # exclusive
    # rank of sorted segment within its cell
    rank = jnp.arange(k, dtype=jnp.int32) - cum_counts[skey]
    slot = jnp.where(skey < n_cells,
                     slot_base[jnp.minimum(skey, n_cells - 1)] + rank,
                     n_slotseg)
    slotseg_to_seg = jnp.full((n_slotseg,), k, jnp.int32)
    slotseg_to_seg = slotseg_to_seg.at[slot].set(seg_order, mode='drop')
    seg_to_slotseg = jnp.full((k,), n_slotseg, jnp.int32)
    seg_to_slotseg = seg_to_slotseg.at[seg_order].set(
        jnp.where(slot < n_slotseg, slot, n_slotseg), mode='drop')

    # cell of each block: from the cell of any segment in it, pad -> n_cells
    first_seg = slotseg_to_seg[::spb]                             # [n_blocks]
    has_seg = first_seg < k
    bcell = jnp.where(
        has_seg, key[jnp.minimum(first_seg, k - 1)], n_cells)
    return {'slotseg_to_seg': slotseg_to_seg,
            'seg_to_slotseg': seg_to_slotseg,
            'block_cell': bcell.astype(jnp.int32),
            'cell_used': counts[:n_cells] > 0}


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
# Pallas kernels
# ---------------------------------------------------------------------------

def _dot_precision(dtype):
    """bf16 mode runs the MXU natively; f32 mode (tests, strict parity)
    must request HIGHEST or the TPU truncates f32 dot operands to bf16."""
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _lod_gather(ent, psel, wgt, tab, E, NP, C, B, LD, dtype,
                swap: bool = False):
    """One LOD's block encode.

    Two MXU orders (same math, different contraction axis):
      * swap=False (large E): [E, C*B] one-hot entry contraction on the MXU
        ([LD*NP, cb] result), then a separable per-axis page select and
        corner sum on the VPU (the 4^3 slot axis factors into three 4-way
        selects — ~1.5x fewer VPU ops than one [NP, C*B] one-hot).
      * swap=True (small E, page_res 32: E = cs/32768): contract the
        NP(=64)-slot axis on the MXU ([LD*E, cb] result — 4-8x fewer
        streamed rows when E < NP), then select entries with the [E, C*B]
        one-hot on the VPU.  With K=E the un-swapped contraction would
        leave 7/8 of the MXU idle.

    ent/psel/wgt: [C, B] refs' loaded blocks (slot = (px*4 + py)*4 + pz);
    tab: slot-major [NP, LD*E] resident window (lanes (d, e);
    swap=False) or [LD*E, NP] (swap=True).  Returns [LD, B] f32.
    """
    cb = C * B
    ent = ent.reshape(cb)                                 # corner-major
    wgt = wgt.reshape(cb)
    psel = psel.reshape(cb)
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (E, cb), 0)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (NP, cb), 0)
    accs = []
    if swap:
        m = (psel[None, :] == p_iota).astype(dtype)       # [NP, C*B]
        g = jax.lax.dot_general(tab.astype(dtype), m,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_dot_precision(dtype))  # [LD*E, cb]
        a = (ent[None, :] == e_iota).astype(jnp.float32)  # [E, C*B]
        for d in range(LD):
            sel = jnp.sum(g[d * E:(d + 1) * E, :] * a, axis=0)
            accs.append(jnp.sum((wgt * sel).reshape(C, B), axis=0))
    else:
        a = (ent[None, :] == e_iota).astype(dtype)        # [E, C*B]
        # [LD*NP, E] rows (d-major) from the slot-major window's d-lanes
        rows = jnp.concatenate(
            [tab[:, d * E:(d + 1) * E] for d in range(LD)], axis=0)
        g = jax.lax.dot_general(rows.astype(dtype), a,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_dot_precision(dtype))  # [LD*NP, cb]
        # NOTE: a separable per-axis select (three 4-way selects over a
        # [4, 4, 4, cb] view) is fewer VPU ops on paper but compiles
        # catastrophically in Mosaic (4D relayouts; fwd 10.8 -> 25.2 ms,
        # 13-min compile).  Keep the flat [NP, cb] one-hot select.
        m = (psel[None, :] == p_iota).astype(jnp.float32)  # [NP, C*B]
        for d in range(LD):
            sel = jnp.sum(g[d * NP:(d + 1) * NP, :] * m, axis=0)
            accs.append(jnp.sum((wgt * sel).reshape(C, B), axis=0))
    return jnp.stack(accs)                                # [LD, B]


def _lod_scatter(ent, psel, wgt, gl, E, NP, C, B, LD, dtype,
                 swap: bool = False):
    """One LOD's block backward; MXU contraction over C*B either way.
    gl: [LD, B] output grad.  Returns the window grad — slot-major
    [NP, LD*E] f32 (lanes (d, e); swap=False) or [LD*E, NP] (swap=True),
    matching the fwd layouts."""
    cb = C * B
    ent = ent.reshape(cb)
    psel = psel.reshape(cb)
    wgt = wgt.reshape(cb)
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (E, cb), 0)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (NP, cb), 0)
    if swap:
        m = (psel[None, :] == p_iota).astype(dtype)       # [NP, C*B]
        a = (ent[None, :] == e_iota).astype(jnp.float32)  # [E, C*B]
        rows = []
        for d in range(LD):
            gd = (jnp.broadcast_to(gl[d][None, :], (C, B)).reshape(cb) * wgt)
            rows.append(a * gd[None, :])                  # [E, C*B]
        dg = jnp.concatenate(rows, axis=0).astype(dtype)  # [LD*E, C*B]
        return jax.lax.dot_general(dg, m, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_dot_precision(dtype))
    a = (ent[None, :] == e_iota).astype(dtype)            # [E, C*B]
    m = (psel[None, :] == p_iota).astype(jnp.float32)     # [NP, C*B]
    rows = []
    for d in range(LD):
        gd = (jnp.broadcast_to(gl[d][None, :], (C, B)).reshape(cb) * wgt)
        rows.append(m * gd[None, :])                      # [NP, C*B]
    dg = jnp.concatenate(rows, axis=0).astype(dtype)      # [LD*NP, C*B]
    g2 = jax.lax.dot_general(dg, a, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_dot_precision(dtype))  # [LD*NP, E]
    if LD == 1:
        return g2
    return jnp.concatenate([g2[d * NP:(d + 1) * NP] for d in range(LD)],
                           axis=1)                        # [NP, LD*E]


def _lod_gather_direct_folded(by, bz, mx, slab, w: int, LD: int, dtype):
    """Corner-folded direct-LOD block encode (see _kernel_direct_folded).

    slab: [w*w, LD*w] resident window.  Returns [LD, B] f32."""
    b = by.shape[1]
    bmat = (by[:, None, :] * bz[None, :, :]).reshape(w * w, b)
    gsel = jax.lax.dot_general(slab.astype(dtype), bmat.astype(dtype),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_dot_precision(dtype))  # [LD*w, B]
    return jnp.stack([jnp.sum(gsel[d * w:(d + 1) * w] * mx, axis=0)
                      for d in range(LD)])


def _lod_scatter_direct_folded(by, bz, mx, gl, w: int, LD: int, dtype):
    """Backward of :func:`_lod_gather_direct_folded`; gl: [LD, B] output
    grad.  Returns the slab-window grad [w*w, LD*w] f32."""
    b = by.shape[1]
    bmat = (by[:, None, :] * bz[None, :, :]).reshape(w * w, b)
    rows = jnp.concatenate([mx * gl[d][None, :] for d in range(LD)], axis=0)
    return jax.lax.dot_general(bmat.astype(dtype), rows.astype(dtype),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_dot_precision(dtype))  # [w*w, LD*w]


def _kernel_block_cell3(bc, g: int = GROUP_RES):
    """Grouping-cell coordinates (3 scalars) of the block's cell id; pad
    blocks (cell == n_cells) clamp to any valid cell — their rows are
    masked by the caller."""
    bc = jnp.minimum(bc, g ** 3 - 1)
    return bc // (g * g), (bc // g) % g, bc % g


def _slab_pack_meta(ws, ld: int):
    """(lane offsets per direct LOD, packed lane width, packed row count)
    of the single packed slab operand.

    All direct LODs share one [wmax², Σ ld·w]-shaped window: individually
    the slabs have ld·w <= 16 lanes, and XLA pads HBM buffers to 128 lanes,
    so streaming them separately moves up to 8x phantom bytes (and issues
    one DMA program per LOD); packed they are lane-dense."""
    offs, total = [], 0
    for w in ws:
        offs.append(total)
        total += ld * w
    wmax2 = max((w * w for w in ws), default=0)
    return tuple(offs), total, wmax2


def _gather_kernel(bc_ref, coords_ref, *args, RES_D, STARTS_D, WS, RES_P,
                   C, B, E, LD, dtype, GR, PR, SWAP, MARGIN, OCC_RES=0):
    """All block-local LODs (direct slabs + paged neighborhoods) in one grid
    pass — amortizes per-step overhead and window streaming over the whole
    LOD stack.  Corner data (entry/psel/weights) is computed in-kernel from
    the block's coords (see the in-kernel corner math section).

    args: if WS: one packed slab ref [1, wmax², Σ ld·w] covering every
    direct LOD (_slab_pack_meta); if RES_P: packed neigh
    [1, E, LP*LD*64] (swap: [1, LD*E, LP*64]); if OCC_RES: the bit-packed
    occupancy slab [1, w*wb, w]; then out [1, Ld+LP(+1), LD, B].
    coords_ref is [1, 3, B].  Output rows follow ascending LOD order
    (direct LODs are the coarser prefix); the occupancy row (channel 0)
    is last when OCC_RES."""
    it = iter(args)
    slab_pack = next(it) if WS else None
    neigh = next(it) if RES_P else None
    occ_slab = next(it) if OCC_RES else None
    out_ref = next(it)
    offs, _, _ = _slab_pack_meta(WS, LD)
    i = pl.program_id(0)
    bc = bc_ref[i]
    is_pad = bc == GR ** 3          # grouping put pad blocks last
    c3 = _kernel_block_cell3(bc, GR)
    # blocks wider than 128 rows process 128-lane halves (Mosaic cannot
    # shape-cast [C, 256] -> [C*256]); one grid step amortizes the window
    # fetch and per-step overhead over all halves
    hb = min(B, 128)

    @pl.when(is_pad)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        for h in range(B // hb):
            coords3 = tuple(coords_ref[0, d, h * hb:(h + 1) * hb]
                            for d in range(3))
            sl = slice(h * hb, (h + 1) * hb)
            li = 0
            for di, w in enumerate(WS):
                by, bz, mx = _kernel_direct_folded(
                    coords3, c3, RES_D[di], STARTS_D[di], w, GR, MARGIN)
                slab = slab_pack[0, 0:w * w, offs[di]:offs[di] + LD * w]
                out_ref[0, li, :, sl] = _lod_gather_direct_folded(
                    by, bz, mx, slab, w=w, LD=LD, dtype=dtype)
                li += 1
            for pi, res in enumerate(RES_P):
                ent, psel, wgt = _kernel_paged_corners(coords3, c3, res,
                                                       E, PR)
                nw = N_NEIGH if SWAP else LD * E
                tab = (neigh[0, :, pi * nw:(pi + 1) * nw])
                out_ref[0, li, :, sl] = _lod_gather(
                    ent, psel, wgt, tab,
                    E=E, NP=N_NEIGH, C=C, B=hb, LD=LD, dtype=dtype,
                    swap=SWAP)
                li += 1
            if OCC_RES:
                ow, owb = occ_slab_width(OCC_RES, MARGIN, GR)
                occv = _kernel_occ_query(
                    coords3, c3, occ_slab[0], OCC_RES, ow, owb, GR, MARGIN,
                    dtype)
                out_ref[0, li, :, sl] = jnp.broadcast_to(
                    occv[None, :], (LD, hb))


def _scatter_kernel(bc_ref, coords_ref, g_ref, *outs, RES_D, STARTS_D, WS,
                    RES_P, C, B, E, LD, dtype, GR, PR, SWAP, MARGIN):
    """Backward of :func:`_gather_kernel`: per-grouping-cell window partials
    for every LOD, accumulated across consecutive same-cell blocks, in the
    same packed layouts as the forward operands (one slab output
    [1, wmax², Σ ld·w] + one neigh output).  The incoming grad g_ref
    [1, L, LD, B] must already be masked by slot validity (corner weights
    are recomputed unmasked in-kernel)."""
    offs, _, _ = _slab_pack_meta(WS, LD)
    i = pl.program_id(0)
    bc = bc_ref[i]
    prev = bc_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (bc != prev)
    c3 = _kernel_block_cell3(bc, GR)
    hb = min(B, 128)                 # 128-lane halves (see _gather_kernel)

    @pl.when(first)
    def _():
        for o in outs:
            o[:] = jnp.zeros_like(o)

    # pad blocks (sorted last by grouping) only zero their dropped window
    @pl.when(bc != GR ** 3)
    def _():
        for h in range(B // hb):
            coords3 = tuple(coords_ref[0, d, h * hb:(h + 1) * hb]
                            for d in range(3))
            sl = slice(h * hb, (h + 1) * hb)
            li = 0
            for di, w in enumerate(WS):
                by, bz, mx = _kernel_direct_folded(
                    coords3, c3, RES_D[di], STARTS_D[di], w, GR, MARGIN)
                outs[0][0, 0:w * w, offs[di]:offs[di] + LD * w] += (
                    _lod_scatter_direct_folded(
                        by, bz, mx, g_ref[0, li, :, sl], w=w, LD=LD,
                        dtype=dtype))
                li += 1
            for pi, res in enumerate(RES_P):
                ent, psel, wgt = _kernel_paged_corners(coords3, c3, res,
                                                       E, PR)
                nw = N_NEIGH if SWAP else LD * E
                outs[1 if WS else 0][0, :, pi * nw:(pi + 1) * nw] += (
                    _lod_scatter(
                        ent, psel, wgt, g_ref[0, li, :, sl],
                        E=E, NP=N_NEIGH, C=C, B=hb, LD=LD, dtype=dtype,
                        swap=SWAP))
                li += 1


def _neigh_table(table, e: int, ld: int, page_res: int = PAGE_RES,
                 swap: bool = False, dtype=None):
    """[cs, ld] table -> per-grouping-cell page neighborhoods in kernel
    layout: [n_cells+1, E, LD*64] (col = l*64 + slot; swap=False) or
    [n_cells+1, LD*E, 64] (row = l*E + entry; swap=True).  ``dtype`` casts
    before the 8x page duplication (see _slab_tables).  swap-mode only —
    the production path uses :func:`_neigh_tables_slot_major`."""
    if dtype is not None:
        table = table.astype(dtype)
    nc = n_cells_of(page_res)
    p = table.shape[0] // e
    pages = table.reshape(p, e * ld)
    ncell = jnp.asarray(_neighbor_pages_np(3, page_res))  # [nc, 64]
    ncell = jnp.concatenate(
        [ncell, jnp.zeros((1, N_NEIGH), jnp.int32)], axis=0)
    neigh = jnp.take(pages, ncell.reshape(-1), axis=0)
    neigh = neigh.reshape(nc + 1, N_NEIGH, e, ld)
    if swap:
        return neigh.transpose(0, 3, 2, 1).reshape(nc + 1, ld * e, N_NEIGH)
    return neigh.transpose(0, 2, 3, 1).reshape(nc + 1, e, ld * N_NEIGH)


def _neigh_tables_slot_major(z, spec, lods_p, e: int, ld: int,
                             page_res: int = PAGE_RES, dtype=None):
    """All paged LODs' neighborhoods in slot-major layout
    [n_cells+1, 64, LP*LD*E] (lane order (lod, d, entry)).

    Slot-major is the gather's natural output order — the per-cell page
    windows come straight out of one jnp.take with NO [cells*64, e] ->
    [cells, e, 64] transpose (a measured multi-ms slice at lego shapes:
    the duplicated windows are ~8x the table).  The kernels contract
    [64, E] x [E, cb] directly, same MXU pass count."""
    p = paged_params(spec.resolutions[lods_p[0]], spec.codebook_size,
                     spec.dim, page_res)[0]
    tabs = []
    for lod in lods_p:
        t = _lod_table(z, spec, lod).reshape(p, e, ld)
        if ld > 1:
            t = t.transpose(0, 2, 1)                     # [p, ld, e]
        tabs.append(t.reshape(p, ld * e))
    stacked = jnp.concatenate(tabs, axis=-1)             # [p, LP*LD*E]
    if dtype is not None:
        stacked = stacked.astype(dtype)
    stacked = jnp.concatenate(
        [stacked, jnp.zeros((1,) + stacked.shape[1:], stacked.dtype)],
        axis=0)
    nc = n_cells_of(page_res)
    ncell = jnp.asarray(_neighbor_pages_np(3, page_res))  # [nc, 64]
    ncell = jnp.concatenate(
        [ncell, jnp.full((1, N_NEIGH), p, jnp.int32)], axis=0)
    neigh = jnp.take(stacked, ncell.reshape(-1), axis=0)
    return neigh.reshape(nc + 1, N_NEIGH, stacked.shape[-1])


def _fold_page_axis(x, group_res: int = GROUP_RES):
    """[g (cell), 4 (offset), ...rest] -> [2g (page), ...rest] along one
    axis of the page-neighborhood reduction: page = clip(2c - 1 + o, 0,
    2g - 1).  Pure static-slice adds — the axis-separable overlap-add that
    replaces a huge one-hot matmul reduce."""
    g = group_res
    rest = x.shape[2:]
    ext = jnp.zeros((g + 1, 2) + rest, x.dtype)
    ext = ext.at[0:g, 0].add(x[:, 0])
    ext = ext.at[0:g, 1].add(x[:, 1])
    ext = ext.at[1:g + 1, 0].add(x[:, 2])
    ext = ext.at[1:g + 1, 1].add(x[:, 3])
    ext = ext.reshape((2 * g + 2,) + rest)                # ext[m] = 2c + o
    lo = (ext[0] + ext[1])[None]                          # pages clip at 0
    hi = (ext[2 * g] + ext[2 * g + 1])[None]              # ... and at 2g-1
    return jnp.concatenate([lo, ext[2:2 * g], hi], axis=0)   # [2g, ...]


@functools.lru_cache(maxsize=None)
def _fold_page_matrix_np(page_res: int):
    """Static 0/1 fold matrix F [P, g, 4]: F[p, c, o] = 1 iff neighborhood
    offset o of grouping cell c lands on page p (p = clip(2c-1+o, 0, P-1))."""
    g = page_res // 2
    f = np.zeros((page_res, g, 4), np.float32)
    for c in range(g):
        for o in range(4):
            p = min(max(2 * c - 1 + o, 0), page_res - 1)
            f[p, c, o] = 1.0
    return f


def _pages_from_cells_dot(partials, e: int, ld: int, lp: int,
                          page_res: int = PAGE_RES):
    """Slot-major per-cell partials [nc, 64, lp*ld*e] -> per-page grads
    [lp, P**3*e, ld].

    The per-axis overlap-add runs as three MXU contractions against a
    static 0/1 fold matrix (exact f32 adds, no explicit transposes) — the
    scatter-add + transpose chain this replaces was the single largest
    backward slice at lego shapes (~8 ms)."""
    g = page_res // 2
    fm = jnp.asarray(_fold_page_matrix_np(page_res))      # [P, g, 4]
    x = partials.reshape(g, g, g, 4, 4, 4, lp, ld, e).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    # dims [cx, cy, cz, i, j, k, lp, ld, e]
    x = jax.lax.dot_general(fm, x, (((1, 2), (2, 5)), ((), ())),
                            precision=hi)   # [pz, cx, cy, i, j, lp, ld, e]
    x = jax.lax.dot_general(fm, x, (((1, 2), (2, 4)), ((), ())),
                            precision=hi)   # [py, pz, cx, i, lp, ld, e]
    x = jax.lax.dot_general(fm, x, (((1, 2), (2, 3)), ((), ())),
                            precision=hi)   # [px, py, pz, lp, ld, e]
    x = x.transpose(3, 0, 1, 2, 5, 4)       # [lp, px, py, pz, e, ld]
    return x.reshape(lp, page_res ** 3 * e, ld)


def _pages_from_cells(partials, e: int, ld: int, lp: int,
                      page_res: int = PAGE_RES, swap: bool = False):
    """Reduce per-grouping-cell neighborhood partials to per-page grads.

    partials: [n_cells, LP, e, ld*64] (col = d*64 + slot,
    slot = (i*4 + j)*4 + k) or [n_cells, LP, ld*e, 64] when ``swap``.
    Returns [LP, cs, ld] f32 — exact, separable per axis
    (see _fold_page_axis)."""
    g = group_res_of(page_res)
    nc = g ** 3
    f = lp * e * ld
    if swap:
        x = partials.reshape(nc, lp, ld, e, 4, 4, 4)
        x = x.transpose(0, 4, 5, 6, 1, 3, 2)              # [cells, i, j, k, lp, e, ld]
    else:
        x = partials.reshape(nc, lp, e, ld, 4, 4, 4)
        x = x.transpose(0, 4, 5, 6, 1, 2, 3)              # [cells, i, j, k, F]
    x = x.reshape(g, g, g, 4, 4, 4, f)
    x = x.transpose(0, 3, 1, 2, 4, 5, 6)                  # [cx, i, cy, cz, j, k, F]
    x = _fold_page_axis(x, g)                             # [px, cy, cz, j, k, F]
    x = x.transpose(1, 3, 0, 2, 4, 5)                     # [cy, j, px, cz, k, F]
    x = _fold_page_axis(x, g)                             # [py, px, cz, k, F]
    x = x.transpose(2, 3, 0, 1, 4)                        # [cz, k, py, px, F]
    x = _fold_page_axis(x, g)                             # [pz, py, px, F]
    x = x.transpose(2, 1, 0, 3)                           # [px, py, pz, F]
    x = x.reshape(page_res ** 3, lp, e, ld)
    return x.transpose(1, 0, 2, 3).reshape(lp, page_res ** 3 * e, ld)


# ---------------------------------------------------------------------------
# Public multi-LOD interp with custom VJP
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PagedStatic:
    """Static closure for paged_interp_lods (hashable; nondiff)."""
    spec: HashGridSpec
    lods: tuple              # paged LOD indices
    direct_lods: tuple = ()  # direct LODs run in-kernel via dense slabs
    interpret: bool = False
    use_bf16: bool = True
    margin: float = DIRECT_MARGIN
    force_swap: bool = None   # None = auto (small E); probing/debug knob
    occ_res: int = 0          # >0: in-kernel fine-occupancy row (pass the
                              # matching occ_slab to paged_interp_lods)

    @property
    def all_lods(self):
        """Kernel output order: direct LODs (the coarser prefix), then
        paged — ascending LOD index overall."""
        return tuple(self.direct_lods) + tuple(self.lods)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.use_bf16 else jnp.float32

    @property
    def page_res(self) -> int:
        return self.spec.page_res

    @property
    def group_res(self) -> int:
        return group_res_of(self.spec.page_res)

    @property
    def n_cells(self) -> int:
        return self.group_res ** 3

    @property
    def entries_per_page(self) -> int:
        if not self.lods:
            return 0
        return paged_params(self.spec.resolutions[self.lods[0]],
                            self.spec.codebook_size, 3, self.spec.page_res)[1]

    @property
    def swap(self) -> bool:
        """Contract the 64-slot axis on the MXU instead of the entry axis
        when entries-per-page is small (see _lod_gather)."""
        if self.force_swap is not None:
            return self.force_swap
        return bool(self.lods) and self.entries_per_page < N_NEIGH


def default_static(spec, interpret: bool = None, use_bf16: bool = True,
                   include_direct: bool = False):
    rest, direct, pag = blocklocal_lods(spec)
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ('tpu', 'axon')
        except Exception:
            interpret = True
    return PagedStatic(spec=spec, lods=pag,
                       direct_lods=direct if include_direct else (),
                       interpret=interpret, use_bf16=use_bf16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def paged_interp_lods(coords_s, slot_valid, block_cell, cell_used, z,
                      occ_slab, static: PagedStatic):
    """Interpolate the block-local LODs' latents at slotted sample coords.

    Covers ``static.direct_lods`` (dense tables via per-grouping-cell
    slabs) and ``static.lods`` (paged hashed tables via 4^3 page
    neighborhoods) in one fused Pallas pass per direction.

    Args:
        coords_s: [NS, 3] slot coords in [-1, 1] (NS = n_blocks * B).
        slot_valid: [NS] bool.
        block_cell: [n_blocks] int32 grouping cell (N_CELLS for pads).
        cell_used: [N_CELLS] bool.
        z: [total_size, ld] full codebook (only covered LOD ranges are read;
            grads are zero elsewhere).
        occ_slab: None, or the bit-packed occupancy slab from
            :func:`occ_slab_tables` (with ``static.occ_res`` set): the
            kernel then appends one occupancy row (non-differentiable,
            values {0., 1.}) after the LOD rows.
        static: PagedStatic (spec, lod index tuples, interpret/dtype).
    Returns:
        [NS, len(static.all_lods) (+1 with occ_slab), ld] f32 interpolated
        latents in ascending LOD order (invalid slots zero).
    """
    return _paged_fwd_impl(coords_s, slot_valid, block_cell, cell_used, z,
                           occ_slab, static)


def _lod_table(z, spec, lod):
    return jax.lax.dynamic_slice_in_dim(
        z, spec.lod_first_idx[lod], spec.lod_sizes[lod], axis=0)


def _slab_widths(static: PagedStatic):
    return tuple(direct_slab_width(static.spec.resolutions[lod],
                                   static.margin, static.group_res)
                 for lod in static.direct_lods)


def _kernel_static_args(static: PagedStatic):
    """Per-LOD static kernel parameters (resolutions, slab starts/widths,
    entries-per-page) shared by the gather and scatter passes."""
    spec = static.spec
    ws = _slab_widths(static)
    res_d = tuple(spec.resolutions[lod] for lod in static.direct_lods)
    starts_d = tuple(tuple(int(s) for s in
                           _slab_starts_np(r, static.margin,
                                           static.group_res)[0])
                     for r in res_d)
    res_p = tuple(spec.resolutions[lod] for lod in static.lods)
    e = static.entries_per_page
    return dict(RES_D=res_d, STARTS_D=starts_d, WS=ws, RES_P=res_p, E=e,
                GR=static.group_res, PR=static.page_res, SWAP=static.swap,
                MARGIN=static.margin)


def _paged_fwd_impl(coords_s, slot_valid, block_cell, cell_used, z,
                    occ_slab, static):
    spec = static.spec
    nb = block_cell.shape[0]
    ns = coords_s.shape[0]
    b = ns // nb
    ld = z.shape[-1]
    c = 2 ** spec.dim
    lods_d, lods_p = static.direct_lods, static.lods
    with_occ = occ_slab is not None and static.occ_res > 0
    l_total = len(lods_d) + len(lods_p)
    l_out = l_total + (1 if with_occ else 0)
    if l_total == 0:
        return jnp.zeros((ns, l_out, ld))
    karg = _kernel_static_args(static)
    if with_occ:
        karg['OCC_RES'] = static.occ_res
    coords_t = coords_s.reshape(nb, b, 3).transpose(0, 2, 1)  # [NB, 3, B]

    import os as _os
    ins = [coords_t]
    in_specs = [pl.BlockSpec((1, 3, b), lambda i, bc: (i, 0, 0))]
    if lods_d:
        offs, wl, wmax2 = _slab_pack_meta(karg['WS'], ld)
        slabs = [_slab_tables(_lod_table(z, spec, lod),
                              spec.resolutions[lod], ld, static.margin,
                              static.group_res, dtype=static.dtype)
                 for lod in lods_d]
        ins += [jnp.concatenate(
            [jnp.pad(s, ((0, 0), (0, wmax2 - s.shape[1]), (0, 0)))
             for s in slabs], axis=-1)]                  # [nc+1, wmax2, WL]
        if _os.environ.get('SHACIRA_PROBE_FIXED_SLAB'):   # probe-only
            in_specs += [pl.BlockSpec((1, wmax2, wl),
                                      lambda i, bc: (0, 0, 0))]
        else:
            in_specs += [pl.BlockSpec((1, wmax2, wl),
                                      lambda i, bc: (bc[i], 0, 0))]
    if lods_p:
        e = karg['E']
        if static.swap:
            neigh = jnp.concatenate(
                [_neigh_table(_lod_table(z, spec, lod), e, ld,
                              static.page_res, True, dtype=static.dtype)
                 for lod in lods_p], axis=-1)
            nshape = (ld * e, len(lods_p) * N_NEIGH)
        else:
            neigh = _neigh_tables_slot_major(z, spec, lods_p, e, ld,
                                             static.page_res,
                                             dtype=static.dtype)
            nshape = (N_NEIGH, len(lods_p) * ld * e)
        ins += [neigh]
        if _os.environ.get('SHACIRA_PROBE_FIXED_NEIGH'):  # probe-only
            in_specs += [pl.BlockSpec((1,) + nshape,
                                      lambda i, bc: (0, 0, 0))]
        else:
            in_specs += [pl.BlockSpec((1,) + nshape,
                                      lambda i, bc: (bc[i], 0, 0))]

    if with_occ:
        ow, owb = occ_slab_width(static.occ_res, static.margin,
                                 static.group_res)
        ins += [occ_slab]
        in_specs += [pl.BlockSpec((1, ow * owb, ow),
                                  lambda i, bc: (bc[i], 0, 0))]

    out = pl.pallas_call(
        functools.partial(_gather_kernel, C=c, B=b, LD=ld,
                          dtype=static.dtype, **karg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, l_out, ld, b),
                                   lambda i, bc: (i, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, l_out, ld, b), jnp.float32),
        interpret=static.interpret,
    )(block_cell, *ins)

    sv = slot_valid.reshape(nb, b).astype(jnp.float32)
    out = out * sv[:, None, None, :]
    return out.transpose(0, 3, 1, 2).reshape(ns, l_out, ld)


def _paged_fwd(coords_s, slot_valid, block_cell, cell_used, z, occ_slab,
               static):
    out = _paged_fwd_impl(coords_s, slot_valid, block_cell, cell_used, z,
                          occ_slab, static)
    # zero-size slice keeps z's dtype as a jax-typed residual
    return out, (coords_s, slot_valid, block_cell, cell_used, z[:0])


def _paged_bwd(static, saved, g):
    coords_s, slot_valid, block_cell, cell_used, z_meta = saved
    zdtype = z_meta.dtype
    spec = static.spec
    nb = block_cell.shape[0]
    ns = coords_s.shape[0]
    b = ns // nb
    ld = g.shape[-1]
    c = 2 ** spec.dim
    lods_d, lods_p = static.direct_lods, static.lods
    l_total = len(lods_d) + len(lods_p)
    if l_total == 0:
        zeros = jnp.zeros((spec.total_size, ld), jnp.float32).astype(zdtype)
        return None, None, None, None, zeros, None
    karg = _kernel_static_args(static)
    ws, e = karg['WS'], karg['E']
    coords_t = coords_s.reshape(nb, b, 3).transpose(0, 2, 1)  # [NB, 3, B]

    # corner weights are recomputed unmasked in-kernel: mask the incoming
    # grad by slot validity instead (same zero contributions).  The
    # occupancy row (if any) is non-differentiable: drop its cotangent.
    l_out = g.shape[1]
    g = g[:, :l_total, :]
    sv = slot_valid.reshape(nb, b).astype(jnp.float32)
    gl = g.reshape(nb, b, l_total, ld).transpose(0, 2, 3, 1)  # [NB, L, LD, B]
    gl = gl.astype(jnp.float32) * sv[:, None, None, :]

    ins = [coords_t, gl]
    in_specs = [pl.BlockSpec((1, 3, b), lambda i, bc: (i, 0, 0)),
                pl.BlockSpec((1, l_total, ld, b), lambda i, bc: (i, 0, 0, 0))]
    nc = static.n_cells
    out_shapes, out_specs = [], []
    if ws:
        offs, wl, wmax2 = _slab_pack_meta(ws, ld)
        out_shapes.append(jax.ShapeDtypeStruct(
            (nc + 1, wmax2, wl), jnp.float32))
        out_specs.append(pl.BlockSpec((1, wmax2, wl),
                                      lambda i, bc: (bc[i], 0, 0)))
    if lods_p:
        nshape = ((ld * e, len(lods_p) * N_NEIGH) if static.swap
                  else (N_NEIGH, len(lods_p) * ld * e))
        out_shapes.append(jax.ShapeDtypeStruct(
            (nc + 1,) + nshape, jnp.float32))
        out_specs.append(pl.BlockSpec((1,) + nshape,
                                      lambda i, bc: (bc[i], 0, 0)))

    partials = pl.pallas_call(
        functools.partial(_scatter_kernel, C=c, B=b, LD=ld,
                          dtype=static.dtype, **karg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        interpret=static.interpret,
    )(block_cell, *ins)
    if not isinstance(partials, (list, tuple)):
        partials = [partials]
    partials = list(partials)

    # unvisited cells hold garbage — mask before reducing to tables.  The
    # window->table reduction chains stream ~10x the table size but stay
    # exact f32 end to end: the scatter-kernel partials are declared f32
    # (out_shapes) and both fold reducers (_slab_grad_to_table,
    # _pages_from_cells_dot) cast to f32 with Precision.HIGHEST — strictly
    # better than the reference's fp16 atomicAdd backward
    # (hashgrid_interpolate_cuda.cu:199-209).
    mask = jnp.concatenate([cell_used, jnp.zeros((1,), bool)])
    pieces = {}
    if lods_d:
        offs, _, _ = _slab_pack_meta(ws, ld)
        ps = jnp.where(mask[:, None, None], partials[0], 0.0)
        for di, lod in enumerate(lods_d):
            w = ws[di]
            pd = ps[:, 0:w * w, offs[di]:offs[di] + ld * w]
            pieces[lod] = _slab_grad_to_table(pd, spec.resolutions[lod], ld,
                                              static.margin,
                                              static.group_res)
    if lods_p:
        lp = len(lods_p)
        pp = jnp.where(mask[:, None, None], partials[1 if lods_d else 0],
                       0.0)
        if static.swap:                 # [nc+1, ld*e, lp*64]
            pp = pp[:nc].reshape(nc, ld * e, lp, N_NEIGH)
            pp = pp.transpose(0, 2, 1, 3)
            tables = _pages_from_cells(pp, e, ld, lp,
                                       static.page_res, True)
        else:                           # [nc+1, 64, lp*ld*e] slot-major
            tables = _pages_from_cells_dot(pp[:nc], e, ld, lp,
                                           static.page_res)
        for pi, lod in enumerate(lods_p):
            pieces[lod] = tables[pi]

    parts = []
    for lod in range(spec.num_lods):
        if lod in pieces:
            parts.append(pieces[lod])
        else:
            parts.append(jnp.zeros((spec.lod_sizes[lod], ld), jnp.float32))
    grad_z = jnp.concatenate(parts, axis=0).astype(zdtype)
    return None, None, None, None, grad_z, None


paged_interp_lods.defvjp(_paged_fwd, _paged_bwd)
