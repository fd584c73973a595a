"""Voxel-path wall attribution at bench (V8) shapes.

Times each stage in isolation on the accelerator (fwd only, jitted,
relay-dispatch ~1.6 ms per call included — subtract when comparing):
  dda        raymarch_voxel (the 3*res+2-step DDA scan)
  seg_take   _stage2_take over the [R*I, S] segment arrays
  group      group_segments on the taken cells
  term       voxel_term_mask
Run: python tools/probe_voxel.py
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(fn, *args, iters=20):
    import numpy as np
    out = fn(*args)
    leaf = [l for l in __import__('jax').tree.leaves(out)][0]
    np.asarray(leaf.reshape(-1)[0:1])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    leaf = [l for l in __import__('jax').tree.leaves(out)][0]
    np.asarray(leaf.reshape(-1)[0:1])
    return (time.time() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from shacira_tpu.core.rays import make_rays
    from shacira_tpu.accel import occupancy as occ
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.ops import paged_hash as ph

    R, I, S = 4096, 64, 16
    cfg = occ.OccupancyGridConfig(level=7)
    state = occ.occupancy_init(cfg)
    res = cfg.res
    g = np.linspace(-1, 1, res, endpoint=False) + 1.0 / res
    xx, yy, zz = np.meshgrid(g, g, g, indexing='ij')
    sphere = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55 ** 2
    dens = np.where(sphere, 10.0, 0.0).astype(np.float32)
    state = {**state, 'occ': jnp.asarray(sphere),
             'density': jnp.asarray(dens)}

    rng = np.random.RandomState(0)
    o = np.asarray([[2.0, 0.6, 0.3]], np.float32) + np.zeros((R, 3),
                                                             np.float32)
    to = rng.uniform(-0.6, 0.6, (R, 3)).astype(np.float32)
    d = to - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(o, d, 0.0, 5.0)
    key = jax.random.PRNGKey(0)

    tcfg = rf_tracer.RFTracerConfig(
        raymarch_type='voxel', num_steps=S, bg_color='white',
        max_intersections=I, max_samples=262144, eval_seg_budget=16384,
        group_segs_per_block=8, term_tau=11.5)

    dda = jax.jit(lambda s, r, k: occ.raymarch_voxel(s, cfg, r, S, k, I))
    out = {'dda_ms': round(timeit(dda, state, rays, key), 2)}

    m = dda(state, rays, key)

    def take(mm):
        k = R * I
        seg = dict(
            samples=mm['samples'].reshape(k, S, 3),
            dirs=jnp.broadcast_to(rays.dirs[:, None, None, :],
                                  (R, I, S, 3)).reshape(k, S, 3),
            mask=mm['mask'].reshape(k, S),
            depth=mm['depth'].reshape(k, S),
            deltas=mm['deltas'].reshape(k, S),
            ray=jnp.broadcast_to(
                jnp.arange(R, dtype=jnp.int32)[:, None, None],
                (R, I, S)).reshape(k, S),
            seg_valid=None)
        return rf_tracer._stage2_take(seg, tcfg)

    out['seg_take_ms'] = round(timeit(jax.jit(take), m), 2)
    seg2 = jax.jit(take)(m)

    def group(s2):
        k2, gsz = s2['samples'].shape[0], s2['samples'].shape[1]
        centers01 = s2['samples'][:, gsz // 2, :] * 0.5 + 0.5
        live = s2['fine'].any(-1) & s2['valid']
        n_blocks = k2 // 8 + tcfg.group_res ** 3
        return ph.group_segments(centers01, live, 8, n_blocks,
                                 tcfg.group_res)

    out['group_ms'] = round(timeit(jax.jit(group), seg2), 2)
    out['term_ms'] = round(timeit(
        jax.jit(lambda s, mm: rf_tracer.voxel_term_mask(
            s, cfg, mm, R, I, S, 11.5)), state, m), 2)
    out['note'] = 'relay dispatch ~1.6 ms included per number'
    print(json.dumps(out))


if __name__ == '__main__':
    main()
