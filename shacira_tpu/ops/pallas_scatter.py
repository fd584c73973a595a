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


def _scatter_kernel(idx_ref, val_ref, out_ref, *, P, E, F, B):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]                                     # [B, 1]
    vals = val_ref[:]                                    # [B, F]
    page = idx // E                                      # [B, 1]
    entry = idx % E                                      # [B, 1]
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    a = (page == p_iota).astype(jnp.bfloat16)            # [B, P]
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (B, E * F), 1) // F
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (B, E * F), 1) % F
    # B_blk[n, e*F + f] = 1[entry_n == e] * val[n, f] without a 3-D temp
    vals_b = vals.astype(jnp.bfloat16)
    val_rep = jnp.tile(vals_b, (1, E))                   # [B, E*F], j -> f=j%F
    del f_iota
    b_blk = jnp.where(entry == e_iota, val_rep, jnp.bfloat16(0))
    # contract over the block axis on the MXU: [P, B] x [B, E*F]
    out_ref[:] += jax.lax.dot_general(
        a, b_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def onehot_scatter_add(idx, vals, table_size: int, *, block: int = 256,
                       entries: int = None, interpret: bool = False):
    """Deterministic scatter-add: out[t] += sum over idx==t of vals.

    Args:
        idx: [N] int32 in [0, table_size).
        vals: [N, F] float (bf16-rounded before MXU accumulation, matching
            the reference's fp16 atomicAdd precision under AMP).
        table_size: number of output rows T.
        entries: page split E (defaults to min(T, 1024); T must divide by it).
    Returns:
        [table_size, F] float32.
    """
    n, f = vals.shape
    e = entries or min(table_size, 1024)
    # pad table to a multiple of E
    t_pad = -(-table_size // e) * e
    p = t_pad // e
    pad = (-n) % block
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), t_pad - 1, idx.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, f), vals.dtype)])
    n_pad = idx.shape[0]

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, P=p, E=e, F=f, B=block),
        out_shape=jax.ShapeDtypeStruct((p, e * f), jnp.float32),
        grid=(n_pad // block,),
        in_specs=[pl.BlockSpec((block, 1), lambda i: (i, 0)),
                  pl.BlockSpec((block, f), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((p, e * f), lambda i: (0, 0)),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None], vals)
    return out.reshape(t_pad, f)[:table_size]


def scatter_add(idx, vals, table_size: int):
    """Dispatch: Pallas one-hot matmul scatter on TPU, XLA scatter elsewhere."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = 'cpu'
    if platform in ('tpu', 'axon') and table_size >= 256:
        return onehot_scatter_add(idx, vals, table_size)
    return jnp.zeros((table_size, vals.shape[-1]),
                     jnp.float32).at[idx].add(vals.astype(jnp.float32))
