"""Micro-benchmarks for step-cost suspects (TPU).

1. Raymarch jitter draw [R, S]: threefry vs rbg PRNG.
2. Paged encode kernel fwd/fwd+bwd vs group_segs_per_block (block-count
   amortization vs slot padding).
Prints one JSON dict.
"""
import functools
import json
import sys
import time

import numpy as np


def sync(x):
    import jax
    leaf = [l for l in jax.tree.leaves(x) if hasattr(l, 'shape')][0]
    np.asarray(leaf.reshape(-1)[0:1])


def timeit(f, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, '.')
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.ops import paged_hash as ph

    report = {}
    R, S = 4096, 2048
    key = jax.random.PRNGKey(0)

    @jax.jit
    def jit_threefry(k):
        return jax.random.uniform(k, (R, S)) / S
    report['jitter_threefry_ms'] = timeit(jit_threefry, key) * 1e3

    @jax.jit
    def jit_rbg(k):
        data = jax.random.key_data(k)
        rk = jax.random.wrap_key_data(jnp.tile(data, 2), impl='rbg')
        return jax.random.uniform(rk, (R, S)) / S
    report['jitter_rbg_ms'] = timeit(jit_rbg, key) * 1e3

    # gumbel draw at codebook scale (SGA)
    T = 2 ** 19

    @jax.jit
    def gumbel_threefry(k):
        return jax.random.gumbel(k, (T, 1, 2))
    report['gumbel_threefry_ms'] = timeit(gumbel_threefry, key) * 1e3

    @jax.jit
    def gumbel_rbg(k):
        data = jax.random.key_data(k)
        rk = jax.random.wrap_key_data(jnp.tile(data, 2), impl='rbg')
        return jax.random.gumbel(rk, (T, 1, 2))
    report['gumbel_rbg_ms'] = timeit(gumbel_rbg, key) * 1e3

    # paged encode vs segments-per-block
    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=24, min_grid_res=16, max_grid_res=512,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=19, init_grid='normal',
        hash_layout='paged')
    spec = grid.spec
    static = ph.default_static(spec, include_direct=True)
    K2, G = 24576, 16
    key2 = jax.random.PRNGKey(1)
    z = jax.random.normal(key2, (spec.total_size, 1))
    centers = jax.random.uniform(key2, (K2, 3))
    live = jnp.ones((K2,), bool)
    # spb=4 (B=64 rows) fails Mosaic's vector reshape (needs >=128 lanes)
    for spb in (8, 16, 32):
        n_blocks = K2 // spb + ph.N_CELLS
        grouping = jax.jit(lambda c, l: ph.group_segments(c, l, spb,
                                                          n_blocks))(
            centers, live)
        ns = n_blocks * spb * G
        coords_s = jax.random.uniform(key2, (ns, 3), minval=-0.9, maxval=0.9)
        slot_valid = jnp.ones((ns,), bool)
        bc = grouping['block_cell']
        cu = grouping['cell_used']
        enc = jax.jit(lambda cs, zz: ph.paged_interp_lods(
            cs, slot_valid, bc, cu, zz, None, static))
        report[f'enc_fwd_spb{spb}_ms'] = timeit(enc, coords_s, z) * 1e3
        enc_vg = jax.jit(jax.value_and_grad(
            lambda zz: jnp.sum(ph.paged_interp_lods(
                coords_s, slot_valid, bc, cu, zz, None, static))))
        report[f'enc_fwd_bwd_spb{spb}_ms'] = timeit(enc_vg, z) * 1e3
        report[f'enc_slot_rows_spb{spb}'] = int(ns)
    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    main()
