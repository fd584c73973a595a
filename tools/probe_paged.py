"""TPU probe: paged-hash kernels at lego shapes (compile + timing).

Usage: python tools/probe_paged.py [--bf16 0|1]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.ops import hashgrid as hg
from shacira_tpu.ops import paged_hash as ph


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def main():
    use_bf16 = True
    if '--bf16' in sys.argv:
        use_bf16 = bool(int(sys.argv[sys.argv.index('--bf16') + 1]))
    page_res = 16
    if '--page-res' in sys.argv:
        page_res = int(sys.argv[sys.argv.index('--page-res') + 1])
    include_direct = '--direct' in sys.argv
    res = hg.geometric_resolutions(16, 512, 24)
    spec = hg.HashGridSpec(res, 19, 3, hash_layout='paged',
                           page_res=page_res)
    non, pag = ph.paged_lods(spec)
    print('resolutions', res)
    print('paged lods', pag, 'E =',
          hg.paged_params(res[pag[0]], 2**19, 3, page_res))

    # grouped sub-segment shapes: page 16 -> 16-sample/8 spb; page 32 ->
    # 8-sample/16 spb over twice the sub-segments (same slot-row count)
    if page_res == 32:
        k_seg2, g, spb = 49152, 8, 16
    else:
        k_seg2, g, spb = 24576, 16, 8
    n_blocks = k_seg2 // spb + ph.n_cells_of(page_res)
    ns = n_blocks * spb * g
    print(f'blocks {n_blocks}  slots {ns}')

    rng = np.random.default_rng(0)
    ld = 1
    z = jnp.asarray(rng.normal(size=(spec.total_size, ld)) * 0.1, jnp.float32)

    # segment-structured coords (rays marching through the volume)
    centers = rng.uniform(0.05, 0.95, (k_seg2, 3))
    d = rng.normal(size=(k_seg2, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = (np.arange(g) - g / 2) * 8.4e-4
    pts01 = np.clip(centers[:, None, :] + d[:, None, :] * t[None, :, None],
                    0, 1)
    coords = jnp.asarray(pts01 * 2 - 1, jnp.float32).reshape(k_seg2, g * 3)
    centers_j = jnp.asarray(centers, jnp.float32)
    live = jnp.ones((k_seg2,), bool)

    rest, direct, pag2 = ph.blocklocal_lods(spec)
    if '--ndirect' in sys.argv:
        nd = int(sys.argv[sys.argv.index('--ndirect') + 1])
        direct = direct[len(direct) - nd:] if nd else ()
    force_swap = None
    if '--swap' in sys.argv:
        force_swap = bool(int(sys.argv[sys.argv.index('--swap') + 1]))
    if '--npaged' in sys.argv:
        npg = int(sys.argv[sys.argv.index('--npaged') + 1])
        pag = pag[:npg] if npg else ()
    static = ph.PagedStatic(spec=spec, lods=pag,
                            direct_lods=direct if include_direct else (),
                            interpret=False, use_bf16=use_bf16,
                            force_swap=force_swap)
    print('swap =', static.swap, 'direct =', static.direct_lods,
          'paged =', static.lods)
    gr = ph.group_res_of(page_res)

    def encode(z, centers_j, coords):
        grp = ph.group_segments(centers_j, live, spb, n_blocks, gr)
        safe = jnp.minimum(grp['slotseg_to_seg'], k_seg2 - 1)
        slot_rows = jnp.take(coords, safe, axis=0)
        sv_seg = grp['slotseg_to_seg'] < k_seg2
        cs = jnp.where(sv_seg[:, None], slot_rows, 0.0).reshape(ns, 3)
        sv = jnp.repeat(sv_seg, g)
        out = ph.paged_interp_lods(cs, sv, grp['block_cell'],
                                   grp['cell_used'], z, None, static)
        return out

    def loss(z, centers_j, coords):
        return jnp.sum(encode(z, centers_j, coords) ** 2)

    fwd = jax.jit(encode)
    grad = jax.jit(jax.grad(loss))
    grp_only = jax.jit(lambda c: ph.group_segments(c, live, spb, n_blocks,
                                                   gr))

    for name, fn, args in [
            ('group', grp_only, (centers_j,)),
            ('fwd', fwd, (z, centers_j, coords)),
            ('fwd+bwd', grad, (z, centers_j, coords))]:
        t0 = time.time()
        out = fn(*args)
        sync(out)
        compile_s = time.time() - t0
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t0) / iters * 1000
        print(json.dumps({'probe': name, 'ms': round(dt, 2),
                          'compile_s': round(compile_s, 1),
                          'bf16': use_bf16}))


if __name__ == '__main__':
    main()
