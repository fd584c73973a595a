"""TPU probe: XLA-side pieces of the paged encode (window builds + grad
reduces) at lego shapes.

Usage: python tools/probe_encode_xla.py
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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters * 1000


def main():
    res = hg.geometric_resolutions(16, 512, 24)
    spec = hg.HashGridSpec(res, 19, 3, hash_layout='paged')
    rest, direct, pag = ph.blocklocal_lods(spec)
    static = ph.PagedStatic(spec=spec, lods=pag, direct_lods=direct,
                            interpret=False, use_bf16=True)
    ld = 1
    e = static.entries_per_page
    nc = static.n_cells
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(spec.total_size, ld)) * 0.1, jnp.float32)

    dt = static.dtype

    def neigh_all(z):
        return ph._neigh_tables_slot_major(z, spec, pag, e, ld,
                                           static.page_res, dtype=dt)

    def slabs_all(z):
        return [ph._slab_tables(ph._lod_table(z, spec, lod),
                                spec.resolutions[lod], ld, static.margin,
                                static.group_res, dtype=dt)
                for lod in direct]

    print(json.dumps({'probe': 'neigh_table_13lods',
                      'ms': round(timeit(jax.jit(neigh_all), z), 2)}))
    print(json.dumps({'probe': 'slab_tables_11lods',
                      'ms': round(timeit(jax.jit(slabs_all), z), 2)}))

    pp = jnp.asarray(rng.normal(size=(nc, 64, len(pag) * ld * e)),
                     jnp.float32)

    def pages_red(pp):
        return ph._pages_from_cells_dot(pp, e, ld, len(pag),
                                        static.page_res)

    print(json.dumps({'probe': 'pages_from_cells_13lods',
                      'ms': round(timeit(jax.jit(pages_red), pp), 2)}))

    gs = []
    for lod in direct:
        w = ph.direct_slab_width(spec.resolutions[lod], static.margin,
                                 static.group_res)
        gs.append(jnp.asarray(rng.normal(size=(nc + 1, w * w, ld * w)),
                              jnp.float32))

    def slab_red(gs):
        return [ph._slab_grad_to_table(g, spec.resolutions[lod], ld,
                                       static.margin, static.group_res)
                for g, lod in zip(gs, direct)]

    print(json.dumps({'probe': 'slab_grad_to_table_11lods',
                      'ms': round(timeit(jax.jit(slab_red), gs), 2)}))


if __name__ == '__main__':
    main()
