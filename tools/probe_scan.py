"""TPU probe: dispatch-free per-iteration costs via lax.scan.

Each piece runs ITERS times inside one jitted lax.scan (device-side loop,
one dispatch), so the number is the true per-step cost the training loop
pays — unlike single-call probes, which carry ~1.6 ms of relay dispatch.

Usage: python tools/probe_scan.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from shacira_tpu.models import latent_decoders as ldec
    from shacira_tpu.models import prob_models as pm
    from shacira_tpu.utils.rng import step_key

    def sync(x):
        leaf = [l for l in jax.tree.leaves(x) if hasattr(l, 'shape')][0]
        np.asarray(leaf.reshape(-1)[0:1])

    def scan_time(body, init, iters=ITERS, reps=3):
        """ms per body() iteration inside lax.scan."""
        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (body(c), None), c,
                                None, length=iters)[0]
        out = run(init)
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = run(out)
        sync(out)
        return (time.time() - t0) / (reps * iters) * 1e3

    T, LD = 7_900_000, 1
    key = jax.random.PRNGKey(0)
    kr = step_key(key, 'unsafe_rbg')
    cb = jax.random.normal(key, (T, LD)) * 2.0
    noise = jax.random.uniform(key, (T, LD)) - 0.5
    rep = {}

    # pure stream bandwidth: read+write 32 MB
    rep['stream_x2_ms'] = scan_time(lambda x: x * 2.0 + 1.0, cb)

    # SGA quantize fwd+bwd (rbg RNG; key folded per iter)
    def sga_body(c):
        w, k = c
        k2 = jax.random.fold_in(k, 1)
        g = jax.grad(lambda w: jnp.sum(
            ldec.sga_quantize(w, 0.5, k2, True)))(w)
        return (w - 1e-6 * g, k2)
    rep['sga_fwd_bwd_ms'] = scan_time(sga_body, (cb, kr))

    # entropy bits fwd+bwd, 4-layer prob model
    cfg = pm.BitEstimatorConfig(LD, 4)
    params = pm.bit_estimator_init(key, cfg)

    def ent_body(c):
        w, p = c
        gw, gp = jax.grad(lambda w, p: pm.entropy_bits(p, cfg, w + noise),
                          argnums=(0, 1))(w, p)
        return (w - 1e-6 * gw, jax.tree.map(lambda a, b: a - 1e-6 * b, p, gp))
    rep['ent_fwd_bwd_l4_ms'] = scan_time(ent_body, (cb, params))

    # Adam-like update
    def adam_body(c):
        p, m, v = c
        g = p * 0.01
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return (p - 0.01 * m / (jnp.sqrt(v) + 1e-8), m, v)
    rep['adam_ms'] = scan_time(adam_body, (cb, cb * 0, cb * 0 + 1))

    # full codebook side in one pass: SGA draw + z + ent loss grads + Adam
    def full_body(c):
        w, m, v, k = c
        k2 = jax.random.fold_in(k, 1)

        def loss(w):
            z = ldec.sga_quantize(w, 0.5, k2, True)
            bits = pm.entropy_bits(params, cfg, w + noise)
            return jnp.sum(z * 1e-3) + 1e-4 * bits / T
        g = jax.grad(loss)(w)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return (w - 0.01 * m / (jnp.sqrt(v) + 1e-8), m, v, k2)
    rep['full_codebook_side_ms'] = scan_time(full_body, (cb, cb * 0,
                                                         cb * 0 + 1, kr))

    # same but with the loss region rematerialized (no saved residuals)
    def full_remat_body(c):
        w, m, v, k = c
        k2 = jax.random.fold_in(k, 1)

        @jax.checkpoint
        def loss(w):
            z = ldec.sga_quantize(w, 0.5, k2, True)
            bits = pm.entropy_bits(params, cfg, w + noise)
            return jnp.sum(z * 1e-3) + 1e-4 * bits / T
        g = jax.grad(loss)(w)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return (w - 0.01 * m / (jnp.sqrt(v) + 1e-8), m, v, k2)
    rep['full_codebook_side_remat_ms'] = scan_time(
        full_remat_body, (cb, cb * 0, cb * 0 + 1, kr))

    # inline noise draw (no carried noise array) vs carried
    def ent_inline_noise_body(c):
        w, k = c
        k2 = jax.random.fold_in(k, 1)
        gw = jax.grad(lambda w: pm.entropy_bits(
            params, cfg, w + jax.random.uniform(k2, w.shape) - 0.5))(w)
        return (w - 1e-6 * gw, k2)
    rep['ent_fwd_bwd_inline_noise_ms'] = scan_time(ent_inline_noise_body,
                                                   (cb, kr))

    rep['device'] = str(jax.devices()[0].platform)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in rep.items()}))


if __name__ == '__main__':
    main()
