"""Micro-probe: per-step full-codebook work at lego scale (T ~ 7.9M, ld 1).

Times the three codebook-wide passes (SGA quantize, entropy bits, Adam) and
shape/RNG variants, to find where the measured 10-14 ms/step goes.
Run on the TPU: python tools/probe_codebook.py
"""
import json
import sys
import time

import numpy as np


def sync(x):
    leaf = [l for l in jax.tree.leaves(x) if hasattr(l, 'shape')][0]
    np.asarray(leaf.reshape(-1)[0:1])


def timeit(f, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / iters * 1e3


if __name__ == '__main__':
    import jax
    import jax.numpy as jnp
    from shacira_tpu.models import latent_decoders as ldec
    from shacira_tpu.models import prob_models as pm
    from shacira_tpu.utils.rng import step_key

    T, LD = 7_900_000, 1
    key = jax.random.PRNGKey(0)
    cb = jax.random.normal(key, (T, LD)) * 2.0
    noise = jax.random.uniform(key, (T, LD)) - 0.5
    rep = {}

    # RNG draw cost
    rep['uniform_threefry_ms'] = timeit(
        jax.jit(lambda k: jax.random.uniform(k, (T, LD))), key)
    kr = step_key(key, 'unsafe_rbg')
    rep['uniform_rbg_ms'] = timeit(
        jax.jit(lambda k: jax.random.uniform(k, (T, LD))), kr)

    # SGA quantize fwd+bwd, [T,1] vs [T]
    def sga_loss(w, k):
        return jnp.sum(ldec.sga_quantize(w, 0.5, k, True))
    rep['sga_fwd_bwd_2d_ms'] = timeit(
        jax.jit(jax.grad(sga_loss)), cb, kr)
    rep['sga_fwd_bwd_1d_ms'] = timeit(
        jax.jit(jax.grad(lambda w, k: sga_loss(w[:, None], k))),
        cb[:, 0], kr)

    # entropy bits fwd+bwd (1-layer and 4-layer prob model)
    for nl in (1, 4):
        cfg = pm.BitEstimatorConfig(LD, nl)
        params = pm.bit_estimator_init(key, cfg)
        f = jax.jit(jax.grad(
            lambda w, p: pm.entropy_bits(p, cfg, w + noise), argnums=(0, 1)))
        rep[f'ent_fwd_bwd_l{nl}_ms'] = timeit(f, cb, params)

    # Adam-like update on (p, g, m, v)
    def adam(p, g, m, v):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return p - 0.01 * m / (jnp.sqrt(v) + 1e-8), m, v
    g = cb * 0.01
    rep['adam_ms'] = timeit(jax.jit(adam), cb, g, cb * 0, cb * 0 + 1)

    # one fused pass: SGA + entropy loss + grads + Adam in a single jit
    cfg1 = pm.BitEstimatorConfig(LD, 1)
    pp = pm.bit_estimator_init(key, cfg1)

    def fused(cbv, m, v, k):
        def loss(w):
            z = ldec.sga_quantize(w, 0.5, k, True)
            bits = pm.entropy_bits(pp, cfg1, w + noise)
            return jnp.sum(z * 1e-3) + 1e-4 * bits / T
        gr = jax.grad(loss)(cbv)
        return adam(cbv, gr, m, v)
    rep['fused_sga_ent_adam_ms'] = timeit(
        jax.jit(fused), cb, cb * 0, cb * 0 + 1, kr)

    rep['device'] = str(jax.devices()[0].platform)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in rep.items()}))
