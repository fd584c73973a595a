"""Scaling analysis: collective traffic of the sharded NeRF train step.

Compiles the data-parallel training step on an 8-virtual-device CPU mesh at
the LEGO table geometry (bw19, 24 LODs, 7.9M latents) and inventories the
collectives GSPMD inserted (op, dtype, bytes/step).  The output feeds the
written scaling model in PARITY.md: per-step collective bytes vs per-device
compute, extrapolated to ICI bandwidth, sets the expected multi-chip
efficiency — this replaces wall-clock numbers from virtual CPU devices,
which share host cores and measure nothing.

Usage: python tools/analyze_scaling.py [--rays 512] [--out traces/...json]
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402


def dtype_bytes(dt: str) -> int:
    return {'f32': 4, 'bf16': 2, 'f16': 2, 's32': 4, 'u32': 4, 'pred': 1,
            'f64': 8, 's8': 1, 'u8': 1}.get(dt, 4)


def collect_collectives(hlo_text: str):
    """Inventory of collective ops in compiled HLO: list of
    (op, dtype, shape, bytes).  Handles tuple-shaped results
    (``= (f32[..], f32[]) all-reduce(..)`` — XLA merges many gradients
    into ONE tuple all-reduce) and async ``-start`` forms."""
    op_pat = re.compile(
        r' = (.*?) (all-gather|all-reduce|reduce-scatter|'
        r'collective-permute|all-to-all)(?:-start|-done)?\(')
    ty_pat = re.compile(r'(\w+)\[([\d,]*)\]')
    out = []
    for line in hlo_text.splitlines():
        m = op_pat.search(line)
        if not m:
            continue
        result_ty, op = m.group(1), m.group(2)
        if '-done(' in line:      # avoid double-counting start/done pairs
            continue
        parts = []
        nbytes = 0
        for t in ty_pat.finditer(result_ty):
            dt, shape_s = t.group(1), t.group(2)
            shape = [int(x) for x in shape_s.split(',') if x] or [1]
            nbytes += int(np.prod(shape)) * dtype_bytes(dt)
            parts.append({'dtype': dt, 'shape': shape})
        out.append({'op': op, 'parts': parts[:8], 'bytes': nbytes})
    return out


def main():
    rays = 512
    if '--rays' in sys.argv:
        rays = int(sys.argv[sys.argv.index('--rays') + 1])
    out_path = 'traces/scaling_model.json'
    if '--out' in sys.argv:
        out_path = sys.argv[sys.argv.index('--out') + 1]

    from shacira_tpu.parallel.mesh import make_mesh
    from shacira_tpu.models.grids.latent_grid import LatentGridConfig
    from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
    from shacira_tpu.tracers import rf_tracer
    from shacira_tpu.trainers.multiview_trainer import (
        MultiviewTrainer, MultiviewTrainerConfig)

    mesh = make_mesh()
    # lego table geometry (nerf_lego.yaml), small ray batch: the big
    # collectives scale with the table, not the rays
    # hashed-LOD geometry of lego (13 LODs at 2^19 rows = 87% of the
    # table; the direct-LOD prefix is 8-indivisible and stays replicated —
    # see PARITY.md scaling model)
    grid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=13, min_grid_res=132, max_grid_res=512,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=19, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True,
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    mcfg = NeuralRadianceFieldConfig(
        grid=grid, hidden_dim=64, num_layers=1,
        view_embedder='positional', view_multires=4, blas_level=7)
    tcfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=256, bg_color='white',
        max_samples=8192, segment_size=16, seg_budget=4096,
        coarse_level=5, seg_dilation=3,
        eval_seg_budget=0)
    cfg = MultiviewTrainerConfig(epochs=2, prune_every=-1, chunk_size=2,
                                 use_sga=True, temperature=1.0,
                                 entropy_reg=1e-4, entropy_reg_end=1e-4)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tests'))
    from test_nerf import synthetic_scene
    data = synthetic_scene(num_views=8, res=16)

    def inventory(mcfg, tcfg, label):
        tr = MultiviewTrainer(cfg, mcfg, tcfg, data, num_rays=rays, seed=0,
                              mesh=mesh)
        assert tr.shard_table_work

        # lower + compile ONE chunk (1 step) and read its HLO
        step = tr._get_chunk_fn(True)
        import jax.numpy as jnp
        n = 1
        nl = mcfg.grid.spec.num_lods
        xs = {
            'rng': jax.random.split(jax.random.PRNGKey(0), n),
            'ent_lambda': jnp.ones((n,), jnp.float32) * 1e-4,
            'temperature': jnp.ones((n,), jnp.float32),
            'lr_ldec': jnp.ones((n,), jnp.float32) * 1e-2,
            'refresh_noise': jnp.ones((n,), bool),
            'lod_mask': jnp.ones((n, nl), jnp.float32),
            'rays_o': jnp.zeros((n, rays, 3), jnp.float32),
            'rays_d': jnp.ones((n, rays, 3), jnp.float32),
            'gt': jnp.zeros((n, rays, 3), jnp.float32),
        }
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(None, 'data'))
        for k in ('rays_o', 'rays_d', 'gt'):
            xs[k] = jax.device_put(xs[k], sh)
        lowered = jax.jit(step).lower(tr.params, tr.opt_state, tr.noise,
                                      tr.occ_state, tr.structure_tables,
                                      xs)
        hlo = lowered.compile().as_text()
        colls = collect_collectives(hlo)

        total = sum(c['bytes'] for c in colls)
        by_op = {}
        for c in colls:
            by_op.setdefault(c['op'], {'count': 0, 'bytes': 0})
            by_op[c['op']]['count'] += 1
            by_op[c['op']]['bytes'] += c['bytes']
        big = sorted(colls, key=lambda c: -c['bytes'])[:12]
        return {
            'config': label,
            'shard_ray_active': bool(getattr(tr, '_shard_ray_active',
                                             False)),
            'per_step_collective_bytes': total,
            'by_op': by_op,
            'largest': big,
        }

    reports = [inventory(mcfg, tcfg,
                         'segmented trace (bw19 hashed table, '
                         f'{rays} rays/step)')]
    # production-like PAGED config: the trace (march + compactions +
    # grouping + Pallas encode kernels) runs under shard_map — the
    # collective-permute resharding GSPMD used to insert around the
    # global compactions must be gone
    pgrid = LatentGridConfig.from_geometric(
        feature_dim=4, num_lods=13, min_grid_res=132, max_grid_res=512,
        latent_dim=1, multiscale_type='cat', resolution_dim=3,
        feature_std=0.02, codebook_bitwidth=19, init_grid='normal',
        num_prob_layers=1, entropy_enabled=True, hash_layout='paged',
    ).with_ldec(dict(norm='none', ldecode_matrix='sq', use_shift=True,
                     ldec_std=0.1, use_sga=True, diff_sampling=True))
    pmcfg = NeuralRadianceFieldConfig(
        grid=pgrid, hidden_dim=64, num_layers=1,
        view_embedder='positional', view_multires=4, blas_level=7)
    ptcfg = rf_tracer.RFTracerConfig(
        raymarch_type='ray', num_steps=2048, bg_color='white',
        max_samples=16384, segment_size=16, seg_budget=32768,
        coarse_level=5, seg_dilation=3, eval_seg_budget=8192,
        group_segs_per_block=8, group_seg_size=8,
        fine_mode='deferred', term_tau=11.5)
    reports.append(inventory(pmcfg, ptcfg,
                             'paged shard_map trace (lego production '
                             f'shape, {rays} rays/step)'))
    # r5 production config: lean stage-1 + two-level super cull
    import dataclasses
    ltcfg = dataclasses.replace(ptcfg, lean_stage1=True, super_factor=4,
                                super_dilation=0)
    reports.append(inventory(pmcfg, ltcfg,
                             'paged shard_map trace + lean/super '
                             f'({rays} rays/step)'))

    report = {'mesh_devices': int(mesh.size), 'runs': reports}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps([
        {'config': r['config'],
         'shard_ray_active': r['shard_ray_active'],
         'total_collective_MB': round(r['per_step_collective_bytes'] / 1e6,
                                      2),
         'by_op': {k: round(v['bytes'] / 1e6, 2)
                   for k, v in r['by_op'].items()}}
        for r in reports] + [{'out': out_path}]))


if __name__ == '__main__':
    main()
