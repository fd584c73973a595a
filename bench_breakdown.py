"""Component-level timing breakdown of the lego-config NeRF train step.

Answers VERDICT r1 item 1: where do the 0.52 s go?  Times each stage of the
step in isolation on the available accelerator and prints a JSON report:

  * full training step (chunked, as benched)        -- the headline
  * loss fwd-only vs fwd+bwd (isolates backward)
  * hash-encode fwd / fwd+bwd at the sample budget  (the gather/scatter walls)
  * one-hot scatter micro at one hashed-LOD's shapes
  * march + compaction + integration with a trivial field (non-encode cost)
  * pruned-scene sustained rate with adaptive budget (the workload the
    reference actually runs: nerf_lego.yaml prunes every 100 iters)

Usage: python bench_breakdown.py [--trace DIR]   (--trace captures xprof)
"""
import json
import sys
import time

import numpy as np


def sync(x):
    """Axon-relay-safe device sync (block_until_ready doesn't block there)."""
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


def paged_breakdown():
    """Phase timings of the PAGED lego-config step (--paged).

    Phases (see rf_tracer._trace_paged): segmented march -> segment
    compaction -> coarse-cell grouping -> paged encode on all segment rows
    -> row compaction -> MLP head -> compact integration."""
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, 'tests')
    from test_nerf import synthetic_scene
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.grids import latent_grid as lg
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.models.nefs import nerf as nerf_mod
    from shacira_tpu.ops import paged_hash as ph
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)
    from shacira_tpu.core.rays import make_rays

    smoke = '--smoke' in sys.argv      # tiny CPU-runnable sanity shapes
    if smoke:
        jax.config.update('jax_platforms', 'cpu')
    report = {'device': str(jax.devices()[0].platform), 'mode': 'paged'}
    key = jax.random.PRNGKey(0)
    N, LD, F = (16384 if smoke else 262144), 1, 4
    K2, G, SPB = (1024 if smoke else 24576), 16, 8
    n_steps = 1024 if smoke else 2048  # cover: span*(G/2+1)/S <= coarse cell
    n_lods = 20 if smoke else 24       # smoke still needs paged (>=2x) LODs
    bw = 14 if smoke else 19

    data = synthetic_scene(num_views=4 if smoke else 20,
                           res=32 if smoke else 64)
    grid = LatentGridConfig.from_geometric(
        feature_dim=F, num_lods=n_lods, min_grid_res=16, max_grid_res=512,
        latent_dim=LD, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=bw, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=128, num_layers=1,
                                     view_embedder='positional',
                                     view_multires=4, blas_level=7)
    tuned = '--tuned' in sys.argv
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=n_steps,
                                    bg_color='white', max_samples=N,
                                    segment_size=G,
                                    coarse_level=7 if tuned else 5,
                                    seg_dilation=2 if tuned else 1,
                                    seg_budget=32768 if tuned else 0,
                                    eval_seg_budget=K2,
                                    group_segs_per_block=SPB)
    cfg = MultiviewTrainerConfig(epochs=300, prune_every=-1, chunk_size=10,
                                 use_sga=True, temperature=1.0,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=4096, seed=0)
    tr.train(num_iterations=10)
    sync(tr.params)
    t0 = time.time()
    tr.train(num_iterations=30)
    sync(tr.params)
    step_s = (time.time() - t0) / 30
    report['full_step_ms'] = step_s * 1e3
    report['rays_per_s'] = 4096 / step_s

    ro = jnp.asarray(data.rays_o[0, :4096])
    rd = jnp.asarray(data.rays_d[0, :4096])
    rays = make_rays(ro, rd, data.dist_min, data.dist_max)
    gt = jnp.asarray(data.rgb[0, :4096])

    # march + segment culling + compaction/integration with a trivial field
    def trivial_field(c, d):
        s = jnp.sum(c * d, -1, keepdims=True)
        return jnp.concatenate([s, s, s], -1), jax.nn.relu(s)

    trace_triv = jax.jit(lambda occ_state, k: rf_tracer.trace(
        trivial_field, occ_state, mcfg.occ_cfg, tcfg, rays, k))
    report['march_integrate_trivial_ms'] = (
        timeit(trace_triv, tr.occ_state, key) * 1e3)

    # same trace fwd+bwd through a scalar density knob — isolates the
    # backward cost of compaction + segmented integration alone
    def triv_loss(th, occ_state, k):
        def f(c, d):
            s = jnp.sum(c * d, -1, keepdims=True) * th
            return jnp.concatenate([s, s, s], -1), jax.nn.relu(s)
        rb = rf_tracer.trace(f, occ_state, mcfg.occ_cfg, tcfg, rays, k)
        return jnp.mean(rb['rgb'])
    triv_vg = jax.jit(jax.value_and_grad(triv_loss))
    report['march_integrate_trivial_fwd_bwd_ms'] = (
        timeit(triv_vg, jnp.float32(1.0), tr.occ_state, key) * 1e3)

    # stride-compaction alone at the step's three shapes (the cumsum +
    # scalar scatter-set); the step runs all three each iteration
    from shacira_tpu.tracers.rf_tracer import _stride_compact
    for nm, nn, bb in (('segs', 4096 * (n_steps // G), 8 * N // G),
                       ('group', 8 * N // G, K2),
                       ('rows', K2 * G, N)):
        mask = jax.random.bernoulli(key, 0.3, (nn,))
        f = jax.jit(lambda m, b=bb: _stride_compact(m, b))
        report[f'stride_compact_{nm}_ms'] = timeit(f, mask) * 1e3

    # fine occupancy query at the live-segment sample count
    from shacira_tpu.accel import occupancy as occ_mod
    qpts = jax.random.uniform(key, (8 * N // G, G, 3), minval=-1, maxval=1)
    qf = jax.jit(lambda s, p: occ_mod.query(s, mcfg.occ_cfg, p))
    report['fine_query_ms'] = timeit(qf, tr.occ_state, qpts) * 1e3

    # grouping alone (sort/cumsum of K2 segment keys)
    centers = jax.random.uniform(key, (K2, 3))
    live = jnp.ones((K2,), bool)
    n_blocks = K2 // SPB + ph.N_CELLS
    grp = jax.jit(lambda c, l: ph.group_segments(c, l, SPB, n_blocks))
    report['grouping_ms'] = timeit(grp, centers, live) * 1e3

    # paged encode in isolation at the kernel's slot shapes
    grouping = jax.jit(lambda c, l: ph.group_segments(c, l, SPB, n_blocks))(
        centers, live)
    spec = grid.spec
    static = ph.default_static(spec, include_direct=True)
    ns = n_blocks * SPB * G
    coords_s = jax.random.uniform(key, (ns, 3), minval=-0.9, maxval=0.9)
    slot_valid = jnp.ones((ns,), bool)
    z = jax.random.normal(key, (spec.total_size, LD))
    bc = grouping['block_cell']
    enc = jax.jit(lambda cs, zz: ph.paged_interp_lods(
        cs, slot_valid, bc, grouping['cell_used'], zz, None, static))
    report['paged_encode_fwd_ms'] = timeit(enc, coords_s, z) * 1e3
    enc_vg = jax.jit(jax.value_and_grad(
        lambda zz: jnp.sum(ph.paged_interp_lods(
            coords_s, slot_valid, bc, grouping['cell_used'], zz, None, static))))
    report['paged_encode_fwd_bwd_ms'] = timeit(enc_vg, z) * 1e3
    report['paged_slot_rows'] = int(ns)
    report['paged_lods'] = len(static.lods)
    report['direct_lods_in_kernel'] = len(static.direct_lods)

    # per-step codebook-wide work: SGA decode (gumbel draw + quantize over
    # the full latent table), entropy loss (BitEstimator over the table),
    # and the 5-group Adam update
    noise = jax.random.uniform(key, (spec.total_size, LD)) - 0.5

    def parts_loss(p, k):
        zz, mat, sh = lg.affine_parts(p['grid'], grid, use_sga=True,
                                      temperature=1.0, rng=k)
        return jnp.sum(zz) + jnp.sum(mat) + jnp.sum(sh)
    pv = jax.jit(jax.value_and_grad(parts_loss))
    report['affine_parts_fwd_bwd_ms'] = timeit(pv, tr.params, key) * 1e3

    def ent_loss_fn(p):
        avg_bits, _ = lg.ent_loss(p['grid'], grid, noise)
        return avg_bits
    ev = jax.jit(jax.value_and_grad(ent_loss_fn))
    report['ent_loss_fwd_bwd_ms'] = timeit(ev, tr.params) * 1e3

    from shacira_tpu import optim
    zero_grads = jax.tree.map(jnp.zeros_like, tr.params)
    lrs = {k: jnp.float32(1e-3) for k in
           ('decoder', 'grid', 'latent_dec', 'prob_models', 'rest')}
    wd = {k: 0.0 for k in lrs}
    opt_fn = jax.jit(lambda g, s, p: optim.adam_update(
        g, s, p, tr.labels, lrs, wd, decoupled=False))
    report['opt_update_ms'] = timeit(opt_fn, zero_grads, tr.opt_state,
                                     tr.params) * 1e3

    # post-compaction finish (affine decode of the in-kernel zbar, plus any
    # unpageable-LOD gather encode) at the compacted row budget
    rest, direct, pag = ph.blocklocal_lods(spec)
    coords_c = jax.random.uniform(key, (N, 3), minval=-0.9, maxval=0.9)
    zbar_c = jax.random.normal(key, (N, len(direct) + len(pag), LD))

    def finish_loss(p, k):
        parts = lg.affine_parts(p['grid'], grid, use_sga=True,
                                temperature=1.0, rng=k)
        return jnp.sum(lg.paged_finish(p['grid'], grid, zbar_c, coords_c,
                                       affine=parts))
    ff = jax.jit(finish_loss)
    report['finish_direct_fwd_ms'] = timeit(ff, tr.params, key) * 1e3
    fv = jax.jit(jax.value_and_grad(finish_loss))
    report['finish_direct_fwd_bwd_ms'] = timeit(fv, tr.params, key) * 1e3

    # full paged loss fwd / fwd+bwd (isolates backward share)
    def loss_fn(p, occ_state, k):
        parts = lg.affine_parts(p['grid'], grid, use_sga=True,
                                temperature=1.0, rng=k)

        def field_fn(c, d):
            return nerf_mod.nerf_rgba(p, mcfg, c, d, affine=parts)

        def encode_fn(c, grouping):
            return nerf_mod.nerf_feats(p, mcfg, c, grouping=grouping,
                                       seg_size=G, affine=parts)

        def head_fn(feats, dirs):
            return nerf_mod.nerf_head(p, mcfg, feats, dirs)

        rb = rf_tracer.trace(field_fn, occ_state, mcfg.occ_cfg, tcfg, rays,
                             k, encode_split=(encode_fn, head_fn))
        return jnp.mean(jnp.abs(rb['rgb'] - gt))

    fwd = jax.jit(loss_fn)
    report['loss_fwd_only_ms'] = timeit(fwd, tr.params, tr.occ_state,
                                        key) * 1e3
    vg = jax.jit(jax.value_and_grad(loss_fn))
    report['loss_fwd_bwd_ms'] = timeit(vg, tr.params, tr.occ_state,
                                       key) * 1e3

    # MLP head alone at the post-compaction row budget
    in_dim = mcfg.density_mlp_cfg.input_dim
    feats = jax.random.normal(key, (N, in_dim))
    dirs = jax.random.normal(key, (N, 3))
    head = jax.jit(lambda p, f, d: nerf_mod.nerf_head(p, mcfg, f, d))
    report['head_fwd_ms'] = timeit(head, tr.params, feats, dirs) * 1e3

    if '--trace' in sys.argv:
        tdir = sys.argv[sys.argv.index('--trace') + 1]
        try:
            with jax.profiler.trace(tdir):
                tr.train(num_iterations=3)
                sync(tr.params)
            report['trace_dir'] = tdir
        except Exception as e:
            report['trace_error'] = repr(e)

    print(json.dumps(report, indent=2))


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, 'tests')
    from test_nerf import synthetic_scene
    from shacira_tpu.ops.hashgrid import (
        make_spec, geometric_resolutions, hash_encode_affine)
    from shacira_tpu.ops.pallas_scatter import onehot_scatter_add
    from shacira_tpu.ops import hashgrid as hg
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    report = {'device': str(jax.devices()[0].platform)}
    key = jax.random.PRNGKey(0)
    N = 262144          # lego sample budget
    LD, F = 1, 4        # latent_dim, feature_dim

    # --- encode micro-benchmarks (lego spec) ------------------------------
    res = geometric_resolutions(16, 512, 24)
    spec = make_spec(res, 19, 3)
    n_hashed = sum(0 if hg.use_direct_index(r, spec.codebook_size, 3) else 1
                   for r in res)
    report['lego_spec'] = {'num_lods': 24, 'hashed_lods': n_hashed,
                           'total_entries': spec.total_size, 'budget': N}
    coords = jax.random.uniform(key, (N, 3), minval=-1.0, maxval=1.0)
    z = jax.random.normal(key, (spec.total_size, LD))
    scale = jax.random.normal(key, (LD, F))
    shift = jnp.zeros((1, F))

    enc = jax.jit(lambda c, zz, s, sh: hash_encode_affine(c, zz, s, sh, spec))
    report['encode_fwd_ms'] = timeit(enc, coords, z, scale, shift) * 1e3

    def enc_loss(zz, s, sh, c):
        return jnp.sum(hash_encode_affine(c, zz, s, sh, spec))
    enc_vg = jax.jit(jax.value_and_grad(enc_loss, argnums=(0, 1, 2)))
    report['encode_fwd_bwd_ms'] = timeit(enc_vg, z, scale, shift, coords) * 1e3

    # one hashed LOD's backward scatter: 8 corner rows per sample, T = 2^19
    T = spec.codebook_size
    idx = jax.random.randint(key, (N * 8,), 0, T)
    vals = jax.random.normal(key, (N * 8, LD))
    sc = jax.jit(lambda i, v: onehot_scatter_add(i, v, T))
    one = timeit(sc, idx, vals) * 1e3
    report['scatter_one_hashed_lod_ms'] = one
    report['scatter_all_hashed_lods_est_ms'] = one * n_hashed

    # --- full-step benchmarks on the synthetic scene ----------------------
    data = synthetic_scene(num_views=20, res=64)
    grid = LatentGridConfig.from_geometric(
        feature_dim=F, num_lods=24, min_grid_res=16, max_grid_res=512,
        latent_dim=LD, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=19, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(grid=grid, hidden_dim=128, num_layers=1,
                                     view_embedder='positional',
                                     view_multires=4, blas_level=7)
    tcfg = rf_tracer.RFTracerConfig(raymarch_type='ray', num_steps=2048,
                                    bg_color='white', max_samples=N,
                                    segment_size=16, coarse_level=5,
                                    seg_dilation=1)
    cfg = MultiviewTrainerConfig(epochs=300, prune_every=-1, chunk_size=10,
                                 use_sga=True, temperature=1.0,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4)
    tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=4096, seed=0)
    tr.train(num_iterations=10)                          # compile + warmup
    sync(tr.params)
    t0 = time.time()
    tr.train(num_iterations=30)
    sync(tr.params)
    step_s = (time.time() - t0) / 30
    report['full_step_ms'] = step_s * 1e3
    report['rays_per_s'] = 4096 / step_s

    # march/compact/integrate with a trivial field (no encode, tiny MLP):
    from shacira_tpu.core.rays import make_rays
    ro = jnp.asarray(data.rays_o[0, :4096])
    rd = jnp.asarray(data.rays_d[0, :4096])
    rays = make_rays(ro, rd, data.dist_min, data.dist_max)

    def trivial_field(c, d):
        s = jnp.sum(c * d, -1, keepdims=True)
        return jnp.concatenate([s, s, s], -1), jax.nn.relu(s)

    trace_fn = jax.jit(lambda occ_state, k: rf_tracer.trace(
        trivial_field, occ_state, mcfg.occ_cfg, tcfg, rays, k))
    report['march_integrate_trivial_ms'] = (
        timeit(trace_fn, tr.occ_state, key) * 1e3)

    # fwd-only loss (no grad) to isolate backward cost
    from shacira_tpu.models.grids import latent_grid as lg
    from shacira_tpu.models.nefs import nerf as nerf_mod
    gt = jnp.asarray(data.rgb[0, :4096])

    def loss_fn(p, occ_state, k):
        parts = lg.affine_parts(p['grid'], grid, use_sga=True,
                                temperature=1.0, rng=k)

        def field_fn(c, d):
            return nerf_mod.nerf_rgba(p, mcfg, c, d, affine=parts)

        rb = rf_tracer.trace(field_fn, occ_state, mcfg.occ_cfg, tcfg, rays, k)
        return jnp.mean(jnp.abs(rb['rgb'] - gt))

    fwd = jax.jit(loss_fn)
    report['loss_fwd_only_ms'] = timeit(fwd, tr.params, tr.occ_state, key) * 1e3
    vg = jax.jit(jax.value_and_grad(loss_fn))
    report['loss_fwd_bwd_ms'] = timeit(vg, tr.params, tr.occ_state, key) * 1e3

    # --- pruned sustained rate (the real workload: nerf_lego prunes /100) --
    import dataclasses
    cfg2 = dataclasses.replace(cfg, prune_every=100, adaptive_budget=True,
                               budget_headroom=1.5, min_budget=16384)
    tr2 = MultiviewTrainer(cfg2, mcfg, tcfg, data, num_rays=4096, seed=0)
    tr2.train(num_iterations=300)                        # reach pruned state
    sync(tr2.params)
    t0 = time.time()
    tr2.train(num_iterations=50)
    sync(tr2.params)
    pruned_s = (time.time() - t0) / 50
    report['pruned_step_ms'] = pruned_s * 1e3
    report['pruned_rays_per_s'] = 4096 / pruned_s
    report['pruned_sample_budget'] = tr2.active_tracer_cfg.max_samples
    report['pruned_occupancy'] = float(np.asarray(
        jnp.mean(tr2.occ_state['occ'].astype(jnp.float32))[None])[0])

    if '--trace' in sys.argv:
        tdir = sys.argv[sys.argv.index('--trace') + 1]
        try:
            with jax.profiler.trace(tdir):
                tr.train(num_iterations=3)
                sync(tr.params)
            report['trace_dir'] = tdir
        except Exception as e:                            # relay may not support
            report['trace_error'] = repr(e)

    print(json.dumps(report, indent=2))


if __name__ == '__main__':
    if '--paged' in sys.argv:
        paged_breakdown()
    else:
        main()
