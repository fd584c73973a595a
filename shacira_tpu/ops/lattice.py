"""Lattice (regular-grid) hash encoding — the MXU-native image path.

For image INRs the training coordinates are the full H x W pixel lattice
(reference 'static coords' fast path).  On a regular lattice the multi-LOD
hash-grid interpolation factorizes into dense linear algebra with NO gathers
or scatters — the two operations that run at ~100M serialized rows/s on TPU
and dominate a naive port:

1. **Dense LOD grids without gathers.**  A LOD's feature grid is
   ``dense[u0, u1] = table[hash(u0, u1)]``.  For direct-indexed LODs
   (``res**2 < table_size``) the table IS the dense grid (a reshape).  For
   XOR-hashed LODs (``hash = (u0 * 1) ^ (u1 * p1) mod 2^bw``, reference
   hashgrid_interpolate2d_cuda.cu:25-34) note that along ``u0`` the hash is
   ``u0 XOR c`` with ``c = (u1 * p1) & mask``: every dense-grid *column* is an
   XOR-permutation of one aligned block of the hash table.  XOR-permutations
   decompose into log2(block) masked half-swaps (a butterfly network) — pure
   vectorized reshapes/selects.  Only one [block, F]-sized row per column is
   fetched (hundreds of big rows, not millions of tiny ones).

2. **Interpolation as separable matmuls.**  Bilinear interpolation of the
   pixel lattice from an R x R grid is ``A0 @ dense @ A1^T`` with static
   interpolation matrices ``A0 [H, R0]``, ``A1 [W, R1]`` (two entries per
   row: 1-frac / frac, exactly the reference corner weights, cu:65-75).
   These are MXU matmuls; the backward is the transposed matmuls plus an
   inverse butterfly — autodiff handles everything, no custom VJP needed.

The result is numerically identical to :func:`shacira_tpu.ops.hashgrid.
hash_encode` on lattice coordinates (tested), with the whole 24-LOD encode +
backward running in a few MXU matmuls instead of ~38M serialized gathers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.ops.hashgrid import HashGridSpec, PRIMES, use_direct_index


@dataclass(frozen=True)
class LatticeMeta:
    spec: HashGridSpec
    h: int
    w: int
    # per-LOD static layout: ('direct',) or ('xor', block_size)
    kinds: Tuple[Tuple, ...]


def _axis_interp_matrix(n_pix: int, res: int) -> np.ndarray:
    """[n_pix, res] two-entry interpolation rows.

    Pixel p maps to grid coord ``u = clip(res * p / n_pix, 0, res-1-1e-5)``
    (the composition of the dataset's pixel->[-1,1] normalization,
    multi_image_dataset.py:151, with the kernel's coord transform, cu:65-66).
    """
    p = np.arange(n_pix, dtype=np.float64)
    u = np.clip(res * p / n_pix, 0, res - 1 - 1e-5)
    lo = np.floor(u).astype(np.int64)
    frac = (u - lo).astype(np.float32)
    a = np.zeros((n_pix, res), np.float32)
    a[np.arange(n_pix), lo] = 1.0 - frac
    a[np.arange(n_pix), np.minimum(lo + 1, res - 1)] += frac
    return a


def build_image_lattice(h: int, w: int, spec: HashGridSpec):
    """Precompute static per-LOD structures for the H x W pixel lattice.

    Returns (meta, arrays) with arrays per LOD:
      a0 [H, R], a1 [W, R]  — interpolation matrices
      bid [R] int32, xorc [R] int32 — hashed LODs only: per-column table
      block id and XOR offset.
    """
    assert spec.dim == 2
    cs = spec.codebook_size
    kinds = []
    arrays = {'a0': [], 'a1': [], 'bid': [], 'xorc': []}
    for lod, res in enumerate(spec.resolutions):
        arrays['a0'].append(jnp.asarray(_axis_interp_matrix(h, res)))
        arrays['a1'].append(jnp.asarray(_axis_interp_matrix(w, res)))
        if use_direct_index(res, cs, 2):
            kinds.append(('direct',))
            arrays['bid'].append(None)
            arrays['xorc'].append(None)
        else:
            # hashed: table size is exactly cs (res^2 >= cs)
            bs = min(1 << int(np.ceil(np.log2(max(res, 2)))), cs)
            u1 = np.arange(res, dtype=np.uint64)
            c = (u1 * np.uint64(PRIMES[1])) & np.uint64(0xFFFFFFFF)
            c = (c & np.uint64(cs - 1)).astype(np.int64)
            kinds.append(('xor', bs))
            arrays['bid'].append(jnp.asarray((c // bs).astype(np.int32)))
            arrays['xorc'].append(jnp.asarray((c % bs).astype(np.int32)))
    return LatticeMeta(spec, h, w, tuple(kinds)), arrays


def _xor_butterfly(cols, xorc, bs: int):
    """cols [R1, bs, F] -> out[j, u0] = cols[j, u0 ^ xorc[j]].

    log2(bs) masked half-swaps; each pass flips segment halves at bit b for
    the columns whose XOR constant has bit b set.
    """
    r1, _, f = cols.shape
    x = cols
    for b in range(int(np.log2(bs))):
        seg = 1 << (b + 1)
        half = 1 << b
        xr = x.reshape(r1, bs // seg, 2, half, f)
        swapped = xr[:, :, ::-1].reshape(r1, bs, f)
        bit = ((xorc >> b) & 1).astype(bool)
        x = jnp.where(bit[:, None, None], swapped, x)
    return x


def lattice_encode(arrays, codebook, meta: LatticeMeta):
    """Encode the full pixel lattice: returns [H*W, L, F] (row-major pixels,
    identical layout/values to hash_encode on the lattice coords)."""
    spec = meta.spec
    f = codebook.shape[-1]
    outs = []
    for lod, res in enumerate(spec.resolutions):
        first = spec.lod_first_idx[lod]
        size = spec.lod_sizes[lod]
        table = jax.lax.dynamic_slice_in_dim(codebook, first, size, axis=0)
        kind = meta.kinds[lod]
        if kind[0] == 'direct':
            # idx = u0 + u1*res (cu:29-30) -> reshape is [u1, u0]
            dense = table.reshape(res, res, f).transpose(1, 0, 2)  # [u0, u1, F]
        else:
            bs = kind[1]
            blocks = table.reshape(size // bs, bs, f)
            cols = blocks[arrays['bid'][lod]]          # [R1, bs, F] big-row gather
            cols = _xor_butterfly(cols, arrays['xorc'][lod], bs)
            if res <= bs:
                dense = cols[:, :res].transpose(1, 0, 2)   # [u0, u1, F]
            else:
                # res > block: the pattern tiles every bs rows along u0
                reps = -(-res // bs)
                dense = jnp.tile(cols, (1, reps, 1))[:, :res].transpose(1, 0, 2)
        a0 = arrays['a0'][lod]
        a1 = arrays['a1'][lod]
        # separable bilinear: [H,R0] @ [R0,R1,F] @ [W,R1]^T on the MXU
        tmp = jnp.einsum('hi,ijf->hjf', a0, dense.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        out = jnp.einsum('hjf,wj->hwf', tmp, a1,
                         preferred_element_type=jnp.float32)
        outs.append(out.reshape(meta.h * meta.w, f))
    return jnp.stack(outs, axis=1).astype(codebook.dtype)   # [N, L, F]
