"""Pallas scatter-add via fused one-hot matmuls — the TPU hash-grid backward.

XLA's scatter-add executes ~one row per 70 ns on TPU, which makes the
hash-grid backward (tens of millions of corner updates per step) the NeRF
training bottleneck.  The MXU-native alternative: a scatter is the matmul
``grad[t, f] = sum_n 1[idx_n == t] * val[n, f]``.  Materializing the one-hot
in HBM is prohibitive, but inside a Pallas kernel each update block builds
its one-hot factors in VMEM and accumulates ``acc += onehot_blk^T @ val_blk``
on the MXU.  The [T, F] accumulator is factored as [P pages x E entries]:

    page_n  = idx_n >> log2(E);   entry_n = idx_n & (E-1)
    acc[p, e*F+f] += sum_n 1[page_n == p] * 1[entry_n == e] * val[n, f]

which is ``A_blk^T [P, B] @ B_blk [B, E*F]`` with
``B_blk = onehot_E(entry) (x) val`` — total FLOPs N*T*F (the MXU eats it),
zero HBM traffic for the one-hots, deterministic f32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(idx_ref, val_ref, out_ref, *, P, E, F, B, SUB,
                    dtype=jnp.bfloat16):
    """Samples live on the LANE axis (1-D idx block, [F, B] value block) so
    VMEM footprints stay compact; each sub-block builds its one-hot factors
    as [P, SUB] / [E*F, SUB] (broadcast over sublanes — no relayouts) and
    contracts over the lane axis on the MXU."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(s, carry):
        off = pl.multiple_of(s * SUB, SUB)
        idx = idx_ref[pl.ds(off, SUB)]                   # [SUB] (lanes)
        vals = val_ref[:, pl.ds(off, SUB)]               # [F, SUB]
        page = (idx // E)[None, :]                       # [1, SUB]
        entry = (idx % E)[None, :]                       # [1, SUB]
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, SUB), 0)
        a = (page == p_iota).astype(dtype)               # [P, SUB]
        ef_iota = jax.lax.broadcasted_iota(jnp.int32, (E * F, SUB), 0) // F
        val_rep = jnp.tile(vals.astype(dtype), (E, 1))   # [E*F, SUB]
        b = jnp.where(entry == ef_iota, val_rep, dtype(0))
        # contract over the lane (sample) axis: [P, SUB] x [E*F, SUB]^T,
        # accumulating straight into the resident output block (saves an
        # accumulator copy of the [P, E*F] f32 table in VMEM)
        out_ref[:] += jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, B // SUB, body, 0)


def onehot_scatter_add(idx, vals, table_size: int, *, block: int = 16384,
                       sub_block: int = 1024,
                       entries: int = None, interpret: bool = False,
                       compute_dtype=jnp.bfloat16):
    """Deterministic scatter-add: out[t] += sum over idx==t of vals.

    Args:
        idx: [N] int32 in [0, table_size).
        vals: [N, F] float (``compute_dtype``-rounded before MXU
            accumulation; bf16 default matches the reference's fp16
            atomicAdd precision under AMP, f32 for exact reductions).
        table_size: number of output rows T.
        entries: page split E (defaults to min(T, 1024); T must divide by it).
    Returns:
        [table_size, F] float32.
    """
    n, f = vals.shape
    # balance the [P, SUB] / [E*F, SUB] one-hot factors and shrink the
    # sub-block when the output table footprint (T*F*4B) is large
    e = entries or max(8, min(table_size, 1024 // max(f, 1)))
    if table_size * f * 4 > 4 * 1024 * 1024:
        sub_block = min(sub_block, 512 * 1024 // max(1, table_size * f // 2048))
        sub_block = max(1024, sub_block // 1024 * 1024)
    # scoped-VMEM caps (16 MB limit): the streamed [F, block] f32 input block
    # at <=2 MB and each [E*F, SUB] one-hot factor at <=2 MB (wide-F callers
    # like the paged-hash neighborhood reduction hit these; F=1 lego paths
    # are unaffected)
    itemsize = jnp.dtype(compute_dtype).itemsize
    while block > 1024 and f * block * 4 > 2 * 1024 * 1024:
        block //= 2
    # SUB must stay a multiple of 1024: Mosaic requires dynamic 1-D load
    # offsets aligned to the (8,128) tile
    while sub_block > 1024 and e * f * sub_block * itemsize > 2 * 1024 * 1024:
        sub_block //= 2
    block = max(block, sub_block)
    block = -(-block // sub_block) * sub_block
    # pad table to a multiple of E
    t_pad = -(-table_size // e) * e
    p = t_pad // e
    pad = (-n) % block
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), t_pad - 1, idx.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, f), vals.dtype)])
    n_pad = idx.shape[0]

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, P=p, E=e, F=f, B=block,
                          SUB=min(sub_block, block), dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((p, e * f), jnp.float32),
        grid=(n_pad // block,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,)),
                  pl.BlockSpec((f, block), lambda i: (0, i))],
        out_specs=pl.BlockSpec((p, e * f), lambda i: (0, 0)),
        interpret=interpret,
    )(idx.astype(jnp.int32), vals.T)
    return out.reshape(t_pad, f)[:table_size]


# measured on v5e: XLA row-scatter ~73 ns/row; the one-hot matmul costs
# ~T*F*2 / 140 TFLOP/s per row -> crossover at T*F ~ 5M (e.g. pearl's 2^23
# tables must use the XLA path, lego's 2^19 x latent_dim=1 uses Pallas)
_XLA_SCATTER_NS_PER_ROW = 73.0
_MXU_FLOPS = 140e12


def scatter_add(idx, vals, table_size: int):
    """Dispatch: Pallas one-hot matmul scatter on TPU when the matmul wins,
    XLA scatter otherwise (cost model above)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = 'cpu'
    f = vals.shape[-1]
    pallas_ns_per_row = table_size * f * 2 / _MXU_FLOPS * 1e9
    if (platform in ('tpu', 'axon') and 256 <= table_size
            and pallas_ns_per_row < _XLA_SCATTER_NS_PER_ROW):
        return onehot_scatter_add(idx, vals, table_size)
    return jnp.zeros((table_size, f),
                     jnp.float32).at[idx].add(vals.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum(idx, vals, num_rows: int):
    """Differentiable deterministic segment-sum: out[r] = sum over idx==r.

    The linear, exact-f32 sibling of :func:`scatter_add` for SMALL output
    tables (per-ray reductions in the tracer: num_rows = #rays).  On TPU the
    forward runs as a one-hot matmul in **f32** (num_rows*F*2 FLOPs per input
    row is negligible for ray counts, and f32 keeps volume-integration sums
    at dense-path precision); the backward of a segment-sum is just a gather
    of the cotangent rows, so training steps never pay a scatter here.

    Args:
        idx: [N] int32 in [0, num_rows).
        vals: [N, F] float32.
    Returns:
        [num_rows, F] float32.
    """
    return _segment_sum_fwd_impl(idx, vals, num_rows)


def _segment_sum_fwd_impl(idx, vals, num_rows: int):
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = 'cpu'
    f = vals.shape[-1]
    # f32 MXU runs at ~1/4 the bf16 rate
    pallas_ns_per_row = num_rows * f * 2 / (_MXU_FLOPS / 4) * 1e9
    if (platform in ('tpu', 'axon')
            and pallas_ns_per_row < _XLA_SCATTER_NS_PER_ROW):
        return onehot_scatter_add(idx, vals.astype(jnp.float32), num_rows,
                                  compute_dtype=jnp.float32)
    return jnp.zeros((num_rows, f),
                     jnp.float32).at[idx].add(vals.astype(jnp.float32))


def _segment_sum_fwd(idx, vals, num_rows: int):
    return _segment_sum_fwd_impl(idx, vals, num_rows), idx


def _segment_sum_bwd(num_rows, idx, ct):
    return None, jnp.take(ct, idx, axis=0).astype(jnp.float32)


segment_sum.defvjp(_segment_sum_fwd, _segment_sum_bwd)
