"""Multiview (NeRF) trainer.

TPU-native re-design of ``wisp/trainers/multiview_trainer.py`` (reference):
chunks of train steps run on-device under ``lax.scan`` with presampled ray
batches stacked into scan inputs; NGP-style pruning updates the dense
occupancy grid between chunks (the reference rebuilds a kaolin octree,
multiview_trainer.py:60-68 + nerf.py:150-185).

Reference semantics preserved:
  * loss = rgb_weight * L1(rgb) + λ * avg_bits (multiview_trainer.py:105-114)
  * pruning every ``prune_every`` iterations (:60-68) with density decay 0.6
    and min density 0.01*512/sqrt(3) (main_nerf.py:140-143)
  * grid-lr scaling by decoder scale-norm (:120-140)
  * PSNR (and SSIM) full-image evaluation (:177-235)
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.core.rays import Rays, make_rays
from shacira_tpu.core.schedulers import DecayScheduler
from shacira_tpu.accel import occupancy as occ
from shacira_tpu.models.grids import latent_grid as lg
from shacira_tpu.models.latent_decoders import scale_norm
from shacira_tpu.models.nefs import nerf as nerf_mod
from shacira_tpu.models.nefs.nerf import NeuralRadianceFieldConfig
from shacira_tpu.tracers import rf_tracer
from shacira_tpu.ops.image import clamped_psnr, psnr as float_psnr, ssim
from shacira_tpu import optim
from shacira_tpu.utils.rng import step_key


@dataclass
class MultiviewTrainerConfig:
    epochs: int = 300
    rgb_loss_weight: float = 1.0
    # optimizer (nerf_lego.yaml)
    optimizer_type: str = 'adam'
    lr: float = 0.0005
    grid_lr: float = 0.02
    ldec_lr: float = 0.01
    scale_grid_lr: str = 'div'
    weight_decay: float = 0.0
    weight_decay_decoder: float = 0.0
    ldec_lr_warmup: int = 5
    # schedules
    use_sga: bool = True
    decay_period: float = 0.9
    temperature: float = 1.0
    entropy_reg: float = 1e-4
    entropy_reg_end: float = 1e-4
    entropy_reg_sched: str = 'cosine'
    noise_freq: int = 1
    # generator for the per-step full-codebook draws (rate-loss dither +
    # SGA logistic); 'unsafe_rbg' = TPU hardware RngBitGenerator
    # (utils/rng.py).  Key stream / checkpoints stay threefry either way.
    rng_impl: str = 'threefry'
    # pruning
    prune_every: int = 100          # iterations (-1 disables)
    # adaptive sample budget: after each prune, shrink the tracer's
    # compaction budget (max_samples) to ~headroom x the expected number of
    # occupied samples, on a power-of-2 ladder.  Steps get proportionally
    # cheaper as pruning empties the scene, at the cost of one recompile per
    # ladder change (a few over a whole run).  TPU-native replacement for the
    # reference's shrinking packed tensors (octree rebuild, nerf.py:150-185).
    adaptive_budget: bool = False
    budget_headroom: float = 1.5
    min_budget: int = 16384
    # random LOD curriculum (ref multiview_trainer.py:91-99): sample a max
    # LOD per step from a geometric distribution and mask finer LODs
    random_lod: bool = False
    # execution
    chunk_size: int = 100
    log_every: int = 10             # epochs
    # lifecycle (ref base_trainer.py:334,377-443)
    valid_every: int = -1           # epochs between val-split validations
    valid_views: int = 4            # views rendered per periodic validation
    save_every: int = -1            # epochs between resume_state.ckpt writes
    render_tb_every: int = -1       # epochs between TB image renders
    # LOD growth curriculum (ref BaseTrainer.grow, base_trainer.py:348-364)
    grow_every: int = -1
    growth_strategy: str = 'increase'


class MultiviewTrainer:
    def __init__(self, cfg: MultiviewTrainerConfig,
                 model_cfg: NeuralRadianceFieldConfig,
                 tracer_cfg: rf_tracer.RFTracerConfig,
                 dataset, num_rays: int, seed: int = 0, mesh=None,
                 val_dataset=None, log_dir=None, logger=None,
                 structure=None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        # alternative grid backbones (grid_type dispatch, ref
        # main_nerf.py:371-505): 'latent' covers LatentGrid + HashGrid;
        # octree/codebook need a host-built OctreeStructure
        self.grid_kind = nerf_mod.grid_kind(model_cfg.grid)
        self.is_latent = self.grid_kind == 'latent'
        if self.grid_kind in ('octree', 'codebook') and structure is None:
            from shacira_tpu.models.grids import octree_grid as og
            if getattr(dataset, 'pointcloud', None) is not None:
                structure = og.OctreeStructure.from_pointcloud(
                    model_cfg.grid, dataset.pointcloud)
            else:
                structure = og.OctreeStructure.make_dense(model_cfg.grid)
        self.structure = structure
        self.structure_tables = (structure.tables()
                                 if structure is not None else None)
        if not self.is_latent and (cfg.random_lod or cfg.grow_every > 0):
            raise ValueError(
                'random_lod / LOD-growth curricula are LatentGrid-only '
                '(alternative backbones ignore lod_mask)')
        if self.is_latent and model_cfg.grid.hash_layout == 'paged':
            # the tracer's segment grouping must match the grid's paged
            # geometry (grouping cells = page_res // 2 per axis)
            from dataclasses import replace as _replace
            tracer_cfg = _replace(tracer_cfg,
                                  group_res=model_cfg.grid.page_res // 2)
        self.tracer_cfg = tracer_cfg
        self.dataset = dataset
        self.val_dataset = val_dataset      # held-out split for validation
        self.log_dir = log_dir
        self.logger = logger                # optional ExperimentLogger
        self.num_rays = num_rays
        self.mesh = mesh
        self.best_val_psnr = -np.inf
        self.val_best_params = None
        self.rng = jax.random.PRNGKey(seed)
        self.np_rng = np.random.RandomState(seed)
        if mesh is not None:
            assert num_rays % mesh.size == 0, (
                f'num_rays {num_rays} must divide mesh size {mesh.size}')

        self.rng, k_init = jax.random.split(self.rng)

        def _init(k):
            params = nerf_mod.nerf_init(k, model_cfg,
                                        structure=self.structure)
            # noise carry exists only for the latent rate loss
            noise = (jnp.zeros_like(params['grid']['codebook'])
                     if self.is_latent else jnp.zeros((1,), jnp.float32))
            return (params, optim.adam_init(params), noise,
                    occ.occupancy_init(model_cfg.occ_cfg, occupied=True))

        (self.params, self.opt_state, self.noise,
         self.occ_state) = jax.jit(_init)(k_init)
        if getattr(dataset, 'pointcloud', None) is not None:
            # depth-captured scenes (RTMV): seed occupancy from the depth
            # pointcloud — the reference pre-builds the octree from it
            # (OctreeAS.from_pointcloud; rtmv 'supports_depth')
            self.occ_state = occ.occupancy_from_points(
                model_cfg.occ_cfg, dataset.pointcloud)
        self.labels = optim.label_params(self.params, optim.shacira_label_fn)
        if mesh is not None:
            from shacira_tpu.parallel import mesh as pmesh
            for attr in ('params', 'opt_state', 'noise', 'occ_state'):
                setattr(self, attr, pmesh.replicate(mesh, getattr(self, attr)))
            # codebook-side table work is sharded across the data axis
            # (VERDICT r2 #3): the Adam moments of the codebook live
            # row-sharded (ZeRO-style), so the moment updates touch
            # table/n rows per device; params stay replicated (the encode
            # gathers arbitrary rows) via one all-gather of the update.
            if (self.is_latent and
                    self.params['grid']['codebook'].shape[0] % mesh.size == 0):
                self.shard_table_work = True
                for tree in (self.opt_state.mu, self.opt_state.nu):
                    tree['grid']['codebook'] = pmesh.shard_rows_global(
                        mesh, tree['grid']['codebook'])
                self.noise = pmesh.shard_rows_global(mesh, self.noise)
            else:
                self.shard_table_work = False
        else:
            self.shard_table_work = False

        gcfg = model_cfg.grid
        self.ldecode_enabled = self.is_latent and gcfg.ldec is not None
        self.entropy_enabled = self.ldecode_enabled and gcfg.entropy_enabled

        # iterations = epochs * views (batch_size 1 view per iter in reference)
        self.iters_per_epoch = dataset.num_views
        total_epochs = cfg.epochs
        self.entropy_reg_sched = DecayScheduler(
            total_epochs, cfg.entropy_reg_sched, cfg.entropy_reg, cfg.entropy_reg_end,
            params={'decay_period': cfg.decay_period, 'temperature': cfg.temperature})
        self.temperature_sched = DecayScheduler(
            total_epochs, 'exp', 1.0, cfg.temperature,
            params={'temperature': cfg.temperature, 'decay_period': cfg.decay_period})
        self.ldec_lr_sched = DecayScheduler(
            cfg.ldec_lr_warmup, 'linear', 0.1 * cfg.ldec_lr, cfg.ldec_lr)

        self.iteration = 0
        if tracer_cfg.super_factor > 1 and tracer_cfg.super_dilation == 0:
            # derive the minimal conservative super-cull dilation from the
            # dataset's ray distance bounds
            from dataclasses import replace as _replace
            tracer_cfg = _replace(
                tracer_cfg,
                super_dilation=rf_tracer.super_dilation_for(
                    tracer_cfg, model_cfg.occ_cfg,
                    float(dataset.dist_min), float(dataset.dist_max)))
            self.tracer_cfg = tracer_cfg
        self.active_tracer_cfg = tracer_cfg
        self._fns = {}
        if tracer_cfg.segment_size > 0:
            rf_tracer.validate_segment_cover(
                tracer_cfg, model_cfg.occ_cfg,
                float(dataset.dist_min), float(dataset.dist_max))
        if tracer_cfg.segment_size > 0:
            self._refresh_coarse()
        if (self.is_latent and model_cfg.grid.hash_layout == 'paged'
                and tracer_cfg.eval_seg_budget > 0):
            from shacira_tpu.ops import paged_hash as ph
            if (tracer_cfg.group_seg_size
                    and tracer_cfg.segment_size % tracer_cfg.group_seg_size):
                raise ValueError(
                    f'group_seg_size {tracer_cfg.group_seg_size} must '
                    f'divide segment_size {tracer_cfg.segment_size}')
            if tracer_cfg.raymarch_type == 'voxel':
                # a voxel segment's samples lie inside one occupancy cell:
                # spread around the center sample <= the cell diagonal
                seg_half01 = float(np.sqrt(3.0)) / model_cfg.occ_cfg.res
            else:
                # world coords live in [-1,1] -> [0,1] halves distances; the
                # grouping cell is keyed on the center *sample* of the
                # GROUPED sub-segment (not the exact midpoint), so allow one
                # extra inter-sample spacing
                gss = tracer_cfg.group_seg_size or tracer_cfg.segment_size
                span = float(dataset.dist_max) - float(dataset.dist_min)
                seg_half01 = span * (gss / 2 + 1) \
                    / tracer_cfg.num_steps / 2.0
            ph.validate_paged_cover(model_cfg.grid.spec, seg_half01)

    # ------------------------------------------------------------------
    def _raw_step(self, use_sga: bool):
        cfg, mcfg, tcfg = self.cfg, self.model_cfg, self.active_tracer_cfg
        gcfg = mcfg.grid
        wd = {'decoder': 0.0, 'grid': cfg.weight_decay,
              'latent_dec': cfg.weight_decay_decoder,
              'prob_models': cfg.weight_decay_decoder, 'rest': 0.0}
        decoupled = cfg.optimizer_type == 'adamw'
        labels = self.labels
        entropy_on = self.entropy_enabled
        dist_min, dist_max = self.dataset.dist_min, self.dataset.dist_max

        mesh = self.mesh
        shard_rows = None
        if self.shard_table_work:
            from shacira_tpu.parallel import mesh as pmesh
            rows_sh = pmesh.row_sharding(mesh)

            def shard_rows(x):
                return jax.lax.with_sharding_constraint(x, rows_sh)

        is_latent = self.is_latent
        affine = is_latent and lg.supports_affine_fusion(gcfg)
        use_paged = (is_latent and gcfg.hash_layout == 'paged' and affine
                     and tcfg.eval_seg_budget > 0
                     and (tcfg.segment_size > 0
                          or tcfg.raymarch_type == 'voxel'))

        # ray-side SPMD: rays are independent, so with a mesh the WHOLE
        # trace — march, budgeted compactions, segment grouping, paged
        # encode kernels, compact integration — runs under jax.shard_map
        # over the data axis at per-device budgets.  Without this, GSPMD
        # reshards around every global cumsum/scatter/sort in the pipeline
        # (~235 MB/step of collective-permutes measured at lego scale —
        # see PARITY §2.11); inside shard_map those ops are device-local
        # and the only step collectives left are the codebook-side ones
        # plus the loss-gradient psum.
        shard_ray_cfg = None
        if mesh is not None and mesh.size > 1:
            try:
                shard_ray_cfg = rf_tracer.per_device_cfg(tcfg, mesh.size)
            except ValueError:
                shard_ray_cfg = None   # indivisible budgets: GSPMD path
        self._shard_ray_active = shard_ray_cfg is not None

        def run_trace(tcfg_loc, p, lat, occ_state, lod_mask,
                      rays_o, rays_d, u):
            """Build the field callables from (params, decoded latents) and
            trace.  `u` is the pre-drawn march jitter (occ.march_uniform) so
            the shard_map'd call samples identically to the single-device
            one on each device's ray slice.  For the alternative backbones
            (octree/codebook/triplanar) `lat` carries the static structure
            tables instead of decoded latents."""
            if not is_latent:
                tables = lat

                def field_fn(coords, dirs):
                    return nerf_mod.nerf_rgba(p, mcfg, coords, dirs,
                                              structure=tables,
                                              training=True)

                encode_split = None
            elif affine:
                parts = lat

                def field_fn(coords, dirs):
                    return nerf_mod.nerf_rgba(p, mcfg, coords, dirs,
                                              affine=parts,
                                              lod_mask=lod_mask)

                encode_split = None
                if use_paged:
                    # paged-encode split (ops/paged_hash.py): grid encode on
                    # segment-grouped rows via the block-local MXU kernels.
                    # 'ray' groups segment_size-sample segments; 'voxel'
                    # groups each intersected cell's num_steps samples.
                    seg_group = (tcfg_loc.num_steps
                                 if tcfg_loc.raymarch_type == 'voxel'
                                 else (tcfg_loc.group_seg_size
                                       or tcfg_loc.segment_size))

                    if tcfg_loc.fine_mode == 'kernel':
                        # in-kernel fine occupancy rides the encode as
                        # an extra row; split it off for the tracer
                        ldim = gcfg.effective_latent_dim

                        def zbar_fn(coords, grouping):
                            zb = nerf_mod.nerf_zbar(
                                p, mcfg, coords, grouping, seg_group,
                                affine=parts,
                                occ_slab=occ_state['occ_slab'],
                                occ_res=mcfg.occ_cfg.res)
                            return zb[:, :-ldim], zb[:, -ldim]
                    else:
                        def zbar_fn(coords, grouping):
                            return nerf_mod.nerf_zbar(
                                p, mcfg, coords, grouping,
                                seg_group, affine=parts)

                    def finish_fn(zbar_c, coords_c):
                        return nerf_mod.nerf_finish_feats(
                            p, mcfg, zbar_c, coords_c, affine=parts,
                            lod_mask=lod_mask)

                    def head_fn(feats, dirs):
                        return nerf_mod.nerf_head(p, mcfg, feats, dirs)

                    encode_split = (zbar_fn, finish_fn, head_fn)
            else:
                decoded = lat

                def field_fn(coords, dirs):
                    return nerf_mod.nerf_rgba(p, mcfg, coords, dirs,
                                              decoded=decoded,
                                              lod_mask=lod_mask)

                encode_split = None

            rays = make_rays(rays_o, rays_d, dist_min, dist_max)
            return rf_tracer.trace(field_fn, occ_state, mcfg.occ_cfg,
                                   tcfg_loc, rays, u,
                                   encode_split=encode_split)

        def step(params, opt_state, noise, occ_state, tables,
                 rays_o, rays_d, gt, rng,
                 ent_lambda, temperature, lr_ldec, refresh_noise, lod_mask):
            k_sga, k_noise, k_march = jax.random.split(rng, 3)
            # bulk full-codebook draws ride the configured generator
            # (utils/rng.py — hardware RngBitGenerator when 'unsafe_rbg')
            k_sga = step_key(k_sga, cfg.rng_impl)
            k_noise = step_key(k_noise, cfg.rng_impl)
            # the [R, num_steps] march jitter is a bulk draw too
            k_march = step_key(k_march, cfg.rng_impl)
            noise_step = noise
            if entropy_on:
                if shard_rows is not None:
                    # table-wide noise/entropy math runs on T/n rows per
                    # device (the scalar rate loss psums)
                    noise = shard_rows(noise)
                if cfg.noise_freq == 1:
                    # refresh-every-step configs (lego): draw inline and
                    # leave the carried array untouched — regenerating via
                    # the step generator is cheaper than streaming the
                    # 32 MB carry (measured 1.7 ms/step, tools/probe_scan)
                    noise_step = jax.random.uniform(k_noise,
                                                    noise.shape) - 0.5
                else:
                    # cond, not where: skip the full-table draw on
                    # non-refresh steps (noise_freq > 1, e.g. pearl's 50)
                    noise = jax.lax.cond(
                        refresh_noise,
                        lambda n: jax.random.uniform(k_noise, n.shape) - 0.5,
                        lambda n: n, noise)
                    noise_step = noise
                if shard_rows is not None:
                    noise_step = shard_rows(noise_step)

            def loss_fn(p):
                # table-wide latent decode (codebook-side work) stays
                # OUTSIDE the shard_map region: with shard_table_work it
                # runs on T/n rows per device, and its product is what the
                # per-device traces consume (one all-gather)
                if not is_latent:
                    lat = tables
                elif affine:
                    # fused latent-width backward when the decoder is affine
                    lat = lg.affine_parts(p['grid'], gcfg, use_sga=use_sga,
                                          temperature=temperature, rng=k_sga)
                    if shard_rows is not None:
                        # the SGA quantize of the full table runs on T/n
                        # rows per device; consumers (encode windows)
                        # all-gather the quantized rows once
                        lat = (shard_rows(lat[0]),) + tuple(lat[1:])
                else:
                    lat = lg.decode_codebook(
                        p['grid'], gcfg, use_sga=use_sga,
                        temperature=temperature, rng=k_sga)

                u = occ.march_uniform(
                    k_march,
                    rf_tracer.march_jitter_shape(tcfg, rays_o.shape[0]))
                if shard_ray_cfg is not None:
                    from functools import partial
                    from jax.sharding import PartitionSpec as P
                    # check_vma=False: the paged Pallas kernels have no
                    # varying-manual-axes rules; grads of the replicated-in
                    # params still psum correctly (transpose follows
                    # in_specs — equivalence-tested in tests/test_parallel)
                    # lean stage-1's jitter input is a (2,)-seed, replicated
                    # (the counter-hash keys jitter by segment identity)
                    u_spec = P() if u.ndim == 1 else P('data')
                    rb = jax.shard_map(
                        partial(run_trace, shard_ray_cfg), mesh=mesh,
                        in_specs=(P(), P(), P(), P(),
                                  P('data'), P('data'), u_spec),
                        out_specs=P('data'), check_vma=False)(
                        p, lat, occ_state, lod_mask, rays_o, rays_d, u)
                else:
                    rb = run_trace(tcfg, p, lat, occ_state, lod_mask,
                                   rays_o, rays_d, u)
                rgb_loss = jnp.mean(jnp.abs(rb['rgb'] - gt))   # L1, ref :105-107
                loss = cfg.rgb_loss_weight * rgb_loss
                aux = {'rgb_loss': rgb_loss, 'rgb': rb['rgb']}
                if entropy_on:
                    avg_bits, total_bits = lg.ent_loss(p['grid'], gcfg,
                                                       noise_step)
                    loss = loss + ent_lambda * avg_bits
                    aux['ent_loss'] = ent_lambda * avg_bits
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

            lr_grid = jnp.asarray(cfg.grid_lr, jnp.float32)
            if (self.ldecode_enabled and cfg.scale_grid_lr != 'none'
                    and mcfg.grid.ldecode_type == 'single'):
                norm = scale_norm(params['grid']['latent_dec'])
                lr_grid = (lr_grid * norm if cfg.scale_grid_lr == 'mul'
                           else lr_grid / norm)
            lrs = {'decoder': jnp.asarray(cfg.lr, jnp.float32), 'grid': lr_grid,
                   'latent_dec': lr_ldec,
                   'prob_models': jnp.asarray(1e-4, jnp.float32),
                   'rest': jnp.asarray(cfg.lr, jnp.float32)}
            params, opt_state = optim.adam_update(
                grads, opt_state, params, labels, lrs, wd, decoupled=decoupled)
            # NOTE: with the moments row-sharded GSPMD keeps the codebook
            # itself row-sharded in the scan carry (ZeRO-3 style) and
            # inserts one all-gather per step in front of the encode's
            # window builds — grads then reduce-scatter instead of
            # all-reduce.  Consumers outside the step re-replicate
            # (train() does on exit).
            metrics = {'loss': loss, 'rgb_loss': aux['rgb_loss'],
                       'psnr': float_psnr(aux['rgb'], gt)}
            return params, opt_state, noise, metrics

        return step

    def _get_chunk_fn(self, use_sga: bool):
        key = ('chunk', use_sga, self.active_tracer_cfg)
        if key in self._fns:
            return self._fns[key]
        step = self._raw_step(use_sga)

        def run_chunk(params, opt_state, noise, occ_state, tables, xs):
            def body(carry, x):
                params, opt_state, noise = carry
                params, opt_state, noise, metrics = step(
                    params, opt_state, noise, occ_state, tables,
                    x['rays_o'], x['rays_d'], x['gt'], x['rng'],
                    x['ent_lambda'], x['temperature'], x['lr_ldec'],
                    x['refresh_noise'], x['lod_mask'])
                return (params, opt_state, noise), metrics

            return jax.lax.scan(body, (params, opt_state, noise), xs)

        fn = jax.jit(run_chunk, donate_argnums=(0, 1, 2))
        self._fns[key] = fn
        return fn

    def _refresh_coarse(self):
        """Recompute the segmented march's derived occupancy products
        (occupancy changes only at prune time — keep them out of the
        per-step program): the coarse culling grid, and in
        fine_mode='kernel' the bit-packed occupancy slab + the dilated
        sub-segment liveness grid."""
        derived = ('coarse', 'coarse2', 'occ_slab', 'fine_dil', 'super')
        if 'coarse' not in self._fns:
            tcfg = self.tracer_cfg
            self._fns['coarse'] = jax.jit(
                lambda s: rf_tracer.coarse_dilated_occupancy(
                    s, self.model_cfg.occ_cfg, tcfg))
            if tcfg.term_tau > 0 and tcfg.raymarch_type == 'ray':
                self._fns['coarse2'] = jax.jit(
                    lambda s: rf_tracer.coarse_packed_grid(
                        s, self.model_cfg.occ_cfg, tcfg))
            if tcfg.super_factor > 1:
                self._fns['super'] = jax.jit(
                    lambda s: rf_tracer.super_grid(
                        s, self.model_cfg.occ_cfg, tcfg))
        base = {k: v for k, v in self.occ_state.items() if k not in derived}
        new = dict(base, coarse=self._fns['coarse'](base))
        if 'coarse2' in self._fns:
            new['coarse2'] = self._fns['coarse2'](base)
        if 'super' in self._fns:
            new['super'] = self._fns['super'](base)
        if self.tracer_cfg.fine_mode == 'kernel':
            from shacira_tpu.ops import paged_hash as ph
            if 'occ_slab' not in self._fns:
                gr = self.tracer_cfg.group_res
                rad = int(np.ceil(self.model_cfg.occ_cfg.res
                                  * ph.DIRECT_MARGIN)) + 1
                self._fns['occ_slab'] = jax.jit(
                    lambda o: ph.occ_slab_tables(o, group_res=gr))
                self._fns['fine_dil'] = jax.jit(
                    lambda s: rf_tracer._coarse_dilated_occupancy(
                        s, self.model_cfg.occ_cfg,
                        self.model_cfg.occ_cfg.res, rad))
            new['occ_slab'] = self._fns['occ_slab'](base['occ'])
            new['fine_dil'] = self._fns['fine_dil'](base)
        self.occ_state = new

    def _get_prune_fn(self):
        if 'prune' not in self._fns:
            self._fns['prune'] = jax.jit(
                lambda params, occ_state, rng, tables: nerf_mod.prune(
                    params, self.model_cfg, occ_state, rng, structure=tables))
        return self._fns['prune']

    # ------------------------------------------------------------------
    def _probe_fraction(self, key: str, body) -> float:
        """Jit-cached occupancy probe on one real presampled ray batch.

        ``body(occ_state, rays, rng) -> scalar``; the result readback uses
        the 1-element-slice sync protocol (axon relay: 0-d readbacks stall).
        """
        if key not in self._fns:
            d = self.dataset

            def probe(occ_state, ro, rd, k):
                return body(occ_state, make_rays(ro, rd, d.dist_min,
                                                 d.dist_max), k)

            self._fns[key] = jax.jit(probe)
        ro, rd, _ = self._presample(1)
        self.rng, k = jax.random.split(self.rng)
        frac = self._fns[key](self.occ_state, jnp.asarray(ro[0]),
                              jnp.asarray(rd[0]), k)
        return float(np.asarray(frac[None])[0])

    def _occupied_sample_fraction(self) -> float:
        """Measured fraction of march samples that land in occupied cells.
        Camera rays concentrate on the occupied region, so this can far
        exceed the volumetric occupancy fraction — the volume estimate
        would under-budget and silently stride-drop real samples."""
        base = self.tracer_cfg

        def body(occ_state, rays, k):
            m = occ.raymarch_ray(occ_state, self.model_cfg.occ_cfg, rays,
                                 base.num_steps, k)
            return jnp.mean(m['mask'].astype(jnp.float32))

        return self._probe_fraction('probe', body)

    def _live_segment_fraction(self) -> float:
        """Measured coarse-live segment fraction (the 'ray' paged path's
        stage-1 survival rate)."""
        base = self.tracer_cfg

        def body(occ_state, rays, k):
            _, _, mask_c = rf_tracer.coarse_segment_live(
                occ_state, self.model_cfg.occ_cfg, base, rays, k)
            return jnp.mean(mask_c.astype(jnp.float32))

        return self._probe_fraction('probe_seg', body)

    def _live_cell_hits_per_ray(self) -> float:
        """Measured mean occupied-cell intersections per ray (the 'voxel'
        paged path's segment count), clipped to the DDA budget."""
        base = self.tracer_cfg

        def body(occ_state, rays, k):
            m = occ.raymarch_voxel(occ_state, self.model_cfg.occ_cfg, rays,
                                   base.num_steps, k, base.max_intersections)
            R = rays.origins.shape[0]
            live = m['mask'].reshape(R, base.max_intersections,
                                     base.num_steps)
            if base.term_tau > 0:
                keep = rf_tracer.voxel_term_mask(
                    occ_state, self.model_cfg.occ_cfg, m, R,
                    base.max_intersections, base.num_steps, base.term_tau)
                live = live & keep[..., None]
            return jnp.mean(jnp.sum(live.any(-1).astype(jnp.float32), -1))

        return self._probe_fraction('probe_voxel', body)

    def _adapt_budget(self):
        """Shrink the compaction budgets to match post-prune occupancy.

        Besides the sample budget (``max_samples``) the paged path's segment
        budgets shrink too: every stage downstream of stage-1 culling —
        grouping, the paged encode kernel, fine queries, row compaction —
        scales with the *segment* budget, so a pruned scene (lego settles
        near ~25% coarse-live) speeds up proportionally."""
        import dataclasses
        base = self.tracer_cfg
        if base.max_samples <= 0:
            return

        def pow2(x):
            """Smallest ladder value >= x on the {2^k, 1.5*2^k} rungs.
            3/4*2^k sits between powers of two, so budgets track the live
            count ~25% tighter than a pure pow2 ladder at the cost of one
            extra rung of compile-cache entries; rungs stay multiples of
            128 for every budget >= 512 (Mosaic block alignment)."""
            p = 1 << int(np.ceil(np.log2(max(x, 1.0))))
            if x <= 0.75 * p and (3 * p) % 512 == 0:
                return (3 * p) // 4
            return p

        if base.raymarch_type == 'ray':
            expected = (self._occupied_sample_fraction()
                        * self.num_rays * base.num_steps)
        else:
            occ_frac = float(np.asarray(
                jnp.mean(self.occ_state['occ'].astype(jnp.float32))[None])[0])
            expected = (occ_frac * self.num_rays * base.num_steps
                        * base.max_intersections)
        k = pow2(max(self.cfg.min_budget, self.cfg.budget_headroom * expected))
        k = min(k, base.max_samples)
        new = {'max_samples': k}

        if (base.raymarch_type == 'ray' and base.segment_size > 0
                and base.eval_seg_budget > 0):
            g = base.segment_size
            ns = base.num_steps // g
            live = self._live_segment_fraction() * self.num_rays * ns
            min_seg = max(256, self.cfg.min_budget // g)
            want = pow2(max(min_seg, self.cfg.budget_headroom * live))
            sb_base = base.seg_budget or max(1, 8 * base.max_samples // g)
            new['seg_budget'] = min(want, sb_base)
            new['eval_seg_budget'] = min(want, base.eval_seg_budget)
            new['max_samples'] = min(k, new['eval_seg_budget'] * g)
        elif base.raymarch_type == 'voxel' and base.eval_seg_budget > 0:
            # voxel paged path: segments are occupied-cell intersections
            # (group size = num_steps, not segment_size)
            g = base.num_steps
            live = self._live_cell_hits_per_ray() * self.num_rays
            min_seg = max(256, self.cfg.min_budget // g)
            want = pow2(max(min_seg, self.cfg.budget_headroom * live))
            new['eval_seg_budget'] = min(want, base.eval_seg_budget)
            new['max_samples'] = min(k, new['eval_seg_budget'] * g)

        cur = {f: getattr(self.active_tracer_cfg, f) for f in new}
        if new != cur:
            self.active_tracer_cfg = dataclasses.replace(base, **new)
            # cached chunk fns for other budgets stay: probes hover around
            # pow2 rungs, and re-evicting would recompile minutes-long XLA
            # programs on every flip (the ladder bounds the cache size)

    def _presample(self, n: int):
        """Host-side ray batch presampling for one chunk (one view per step)."""
        d = self.dataset
        ro = np.empty((n, self.num_rays, 3), np.float32)
        rd = np.empty((n, self.num_rays, 3), np.float32)
        gt = np.empty((n, self.num_rays, 3), np.float32)
        for i in range(n):
            v = self.np_rng.randint(d.num_views)
            idx = self.np_rng.randint(0, d.rgb.shape[1], size=self.num_rays)
            ro[i] = d.rays_o[v, idx]
            rd[i] = d.rays_d[v, idx]
            gt[i] = d.rgb[v, idx]
        return ro, rd, gt

    def _epoch_of(self, it: int) -> int:
        return it // self.iters_per_epoch + 1

    def train(self, num_iterations: Optional[int] = None, log_fn=None):
        cfg = self.cfg
        # default: train to the configured END (absolute), so resuming from
        # a checkpoint finishes the schedule instead of restarting its count
        total = (num_iterations if num_iterations is not None
                 else max(0, cfg.epochs * self.iters_per_epoch
                          - self.iteration))
        t0 = time.time()
        done = 0
        while done < total:
            it0 = self.iteration + 1
            n = min(cfg.chunk_size, total - done)
            if cfg.prune_every > 0:
                # stop chunk at the next prune boundary
                next_prune = ((self.iteration // cfg.prune_every) + 1) * cfg.prune_every
                n = min(n, next_prune - self.iteration)
            # stop chunks at lifecycle epoch boundaries (valid/save/render_tb)
            e_cur = self._epoch_of(it0)
            for every in (cfg.valid_every, cfg.save_every, cfg.render_tb_every):
                if every and every > 0:
                    nxt = (((e_cur - 1) // every) + 1) * every * self.iters_per_epoch
                    n = min(n, max(1, nxt - self.iteration))
            e0 = self._epoch_of(it0)
            use_sga = (self.ldecode_enabled and cfg.use_sga
                       and (e0 / cfg.epochs) <= cfg.decay_period)

            epochs = np.asarray([self._epoch_of(it) for it in range(it0, it0 + n)])
            xs = {
                'ent_lambda': jnp.asarray([self.entropy_reg_sched(e) for e in epochs],
                                          jnp.float32),
                'temperature': jnp.asarray([self.temperature_sched(e) for e in epochs],
                                           jnp.float32),
                'lr_ldec': jnp.asarray([self.ldec_lr_sched(e) for e in epochs],
                                       jnp.float32),
                'refresh_noise': jnp.asarray(
                    (np.arange(it0 - 1, it0 - 1 + n) % max(cfg.noise_freq, 1)) == 0),
            }
            self.rng, k = jax.random.split(self.rng)
            xs['rng'] = jax.random.split(k, n)
            num_lods = self.model_cfg.grid.num_lods
            if cfg.random_lod:
                # geometric distribution over LODs (weights 2^i, ref :93-96)
                w = 2.0 ** np.arange(num_lods)
                lods = self.np_rng.choice(num_lods, size=n, p=w / w.sum())
                masks = (np.arange(num_lods)[None, :] <= lods[:, None])
                xs['lod_mask'] = jnp.asarray(masks.astype(np.float32))
            elif cfg.grow_every > 0:
                # LOD growth curriculum (ref BaseTrainer.grow, :348-364);
                # inactive LODs are feature-masked
                from shacira_tpu.core.schedulers import grow_loss_lods
                masks = np.zeros((n, num_lods), np.float32)
                for i, e in enumerate(epochs):
                    masks[i, grow_loss_lods(int(e), num_lods, cfg.grow_every,
                                            cfg.growth_strategy)] = 1.0
                xs['lod_mask'] = jnp.asarray(masks)
            else:
                xs['lod_mask'] = jnp.ones((n, num_lods), jnp.float32)
            ro, rd, gt = self._presample(n)
            if self.mesh is not None:
                # shard the ray axis (dim 1) across the data axis; params
                # stay replicated and XLA psums the gradients (multihost:
                # each process contributes its host-local ray slice)
                from shacira_tpu.parallel import mesh as pmesh
                (xs['rays_o'], xs['rays_d'], xs['gt']) = pmesh.shard_axis(
                    self.mesh, 1, ro, rd, gt)
            else:
                xs['rays_o'] = jnp.asarray(ro)
                xs['rays_d'] = jnp.asarray(rd)
                xs['gt'] = jnp.asarray(gt)

            run = self._get_chunk_fn(use_sga)
            (self.params, self.opt_state, self.noise), metrics = run(
                self.params, self.opt_state, self.noise, self.occ_state,
                self.structure_tables, xs)
            self.iteration += n
            done += n

            if (cfg.prune_every > 0 and self.iteration > 1
                    and self.iteration % cfg.prune_every == 0):
                self.rng, k = jax.random.split(self.rng)
                self.occ_state = self._get_prune_fn()(
                    self.params, self.occ_state, k, self.structure_tables)
                if self.tracer_cfg.segment_size > 0:
                    self._refresh_coarse()
                if cfg.adaptive_budget:
                    self._adapt_budget()

            if log_fn or self.logger is not None:
                entry = {'iteration': self.iteration,
                         'epoch': self._epoch_of(self.iteration),
                         'rgb_loss': float(np.asarray(metrics['rgb_loss'][-1:])[0]),
                         'psnr': float(np.asarray(metrics['psnr'][-1:])[0]),
                         'occupancy': float(np.asarray(
                             jnp.mean(self.occ_state['occ'])[None])[0]),
                         'elapsed': time.time() - t0}
                if cfg.adaptive_budget and self.tracer_cfg.max_samples > 0:
                    entry['sample_budget'] = self.active_tracer_cfg.max_samples
                if self.logger is not None:
                    for k in ('rgb_loss', 'psnr', 'occupancy'):
                        self.logger.scalar(f'train/{k}', entry[k],
                                           self.iteration)
                if log_fn:
                    log_fn(entry)
            self._post_chunk(log_fn)
        if self.shard_table_work:
            # with row-sharded moments GSPMD keeps the codebook row-sharded
            # in the scan carry; re-replicate for downstream consumers
            # (validation/eval render paths, checkpoints).  jitted identity
            # with an output sharding: works multihost too (device_put
            # cannot cross processes)
            from shacira_tpu.parallel import mesh as pmesh
            self.params['grid']['codebook'] = jax.jit(
                lambda x: x,
                out_shardings=pmesh.replicated(self.mesh))(
                self.params['grid']['codebook'])
        return {'iterations': self.iteration,
                'elapsed': time.time() - t0}

    # ------------------------------------------------------------------
    def _post_chunk(self, log_fn=None):
        """Periodic lifecycle: validation (valid_every), resume-state
        checkpoint (save_every), TB render (render_tb_every) — at exact epoch
        boundaries (chunks are clipped to them in train())."""
        cfg = self.cfg
        if self.iteration % self.iters_per_epoch != 0:
            return
        e = self.iteration // self.iters_per_epoch
        if cfg.valid_every > 0 and e % cfg.valid_every == 0:
            m = self.validate()
            if self.logger is not None:
                self.logger.scalar('valid/psnr', m['psnr'], self.iteration)
                self.logger.scalar('valid/ssim', m['ssim'], self.iteration)
            if log_fn:
                log_fn({'epoch': e, 'valid_psnr': m['psnr'],
                        'valid_ssim': m['ssim'],
                        'best_val_psnr': self.best_val_psnr})
        if (cfg.render_tb_every > 0 and e % cfg.render_tb_every == 0
                and self.logger is not None):
            d = self.val_dataset or self.dataset
            self.logger.image('render/view0', self.render_view(0, dataset=d),
                              self.iteration)
        if cfg.save_every > 0 and e % cfg.save_every == 0 and self.log_dir:
            from shacira_tpu.utils import checkpoint
            import os
            checkpoint.save_trainer(
                self, os.path.join(self.log_dir, 'resume_state.ckpt'))

    def validate(self) -> Dict[str, float]:
        """Validation on the held-out split (ref validate,
        multiview_trainer.py:275-323): render ``valid_views`` evenly-spaced
        views, track the best-by-validation state for model_best."""
        d = self.val_dataset or self.dataset
        stride = max(1, d.num_views // max(1, self.cfg.valid_views))
        m = self.evaluate(view_indices=range(0, d.num_views, stride),
                          dataset=d)
        if m['psnr'] > self.best_val_psnr:
            self.best_val_psnr = m['psnr']
            self.val_best_params = jax.tree.map(np.asarray, self.params)
        if self.logger is not None:
            self.logger.record({'iteration': self.iteration, **m})
        return m

    # ------------------------------------------------------------------
    def render_view(self, view_idx: int, ray_batch: int = 4096,
                    rng=None, dataset=None, params=None,
                    lod_mask=None) -> np.ndarray:
        """Render one dataset view (eval mode: rounded latents).

        The codebook is decoded ONCE per view render (the reference's
        valid-only path likewise decodes once and swaps in a DecoderIdentity,
        main_nerf.py:669-672) — not inside every ray batch.
        """
        d = dataset if dataset is not None else self.dataset
        params = params if params is not None else self.params
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mcfg, tcfg = self.model_cfg, self.tracer_cfg

        is_latent = self.is_latent
        paged_eval = (is_latent
                      and mcfg.grid.hash_layout == 'paged'
                      and lg.supports_affine_fusion(mcfg.grid)
                      and tcfg.eval_seg_budget > 0
                      and (tcfg.segment_size > 0
                           or tcfg.raymarch_type == 'voxel'))
        if not self.is_latent:
            # alternative backbones: the 'decoded' slot carries the static
            # structure tables (octree/codebook) or None (triplanar)
            decoded = self.structure_tables
        elif paged_eval:
            # eval-mode (rounded) affine parts replace the dense decode:
            # the paged kernels decode after interpolation
            if 'affine_once' not in self._fns:
                self._fns['affine_once'] = jax.jit(
                    lambda p: lg.affine_parts(p['grid'], mcfg.grid))
            decoded = self._fns['affine_once'](params)
        else:
            if 'decode_once' not in self._fns:
                self._fns['decode_once'] = jax.jit(
                    lambda p: lg.decode_codebook(p['grid'], mcfg.grid))
            decoded = self._fns['decode_once'](params)

        if tcfg.fine_mode == 'kernel':
            # rendering uses its own jitted fn; the XLA fine query is fine
            # there (no training-throughput stakes) and needs no occ slab
            from dataclasses import replace as _replace
            tcfg = _replace(tcfg, fine_mode='deferred')

        key = ('render_batch', float(d.dist_min), float(d.dist_max),
               lod_mask is None, paged_eval)
        if key not in self._fns:
            dist_min, dist_max = d.dist_min, d.dist_max
            seg_group = (tcfg.num_steps if tcfg.raymarch_type == 'voxel'
                         else (tcfg.group_seg_size or tcfg.segment_size))

            @jax.jit
            def render_batch(params, decoded, occ_state, ro, rd, k, lmask):
                rays = make_rays(ro, rd, dist_min, dist_max)
                if paged_eval:
                    parts = decoded

                    def field_fn(coords, dirs):
                        return nerf_mod.nerf_rgba(params, mcfg, coords, dirs,
                                                  affine=parts,
                                                  lod_mask=lmask)

                    def zbar_fn(coords, grouping):
                        return nerf_mod.nerf_zbar(params, mcfg, coords,
                                                  grouping, seg_group,
                                                  affine=parts)

                    def finish_fn(zbar_c, coords_c):
                        return nerf_mod.nerf_finish_feats(
                            params, mcfg, zbar_c, coords_c, affine=parts,
                            lod_mask=lmask)

                    def head_fn(feats, dirs):
                        return nerf_mod.nerf_head(params, mcfg, feats, dirs)

                    return rf_tracer.trace(
                        field_fn, occ_state, mcfg.occ_cfg, tcfg, rays, k,
                        encode_split=(zbar_fn, finish_fn, head_fn))['rgb']

                if is_latent:
                    def field_fn(coords, dirs):
                        return nerf_mod.nerf_rgba(params, mcfg, coords,
                                                  dirs, decoded=decoded,
                                                  lod_mask=lmask)
                else:
                    # alternative backbones render in eval mode (VQAD:
                    # argmax dictionary lookup, ref codebook_grid.py:298-302)
                    def field_fn(coords, dirs):
                        return nerf_mod.nerf_rgba(params, mcfg, coords,
                                                  dirs, structure=decoded,
                                                  training=False)

                return rf_tracer.trace(field_fn, occ_state, mcfg.occ_cfg,
                                       tcfg, rays, k)['rgb']

            self._fns[key] = render_batch
        render_batch = self._fns[key]

        lmask = (jnp.ones((mcfg.grid.num_lods,), jnp.float32)
                 if lod_mask is None else jnp.asarray(lod_mask))
        npix = d.rgb.shape[1]
        out = np.zeros((npix, 3), np.float32)
        for s in range(0, npix, ray_batch):
            e = min(s + ray_batch, npix)
            ro = jnp.asarray(d.rays_o[view_idx, s:e])
            rd = jnp.asarray(d.rays_d[view_idx, s:e])
            if e - s < ray_batch:                   # pad tail to avoid recompile
                pad = ray_batch - (e - s)
                ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))])
                rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
            rng, k = jax.random.split(rng)
            rgb = np.asarray(render_batch(params, decoded, self.occ_state,
                                          ro, rd, k, lmask))
            out[s:e] = rgb[:e - s]
        return out.reshape(d.h, d.w, 3)

    def evaluate(self, view_indices=None, dataset=None) -> Dict[str, float]:
        """PSNR/SSIM(/LPIPS) over views (ref evaluate_metrics, :177-235).

        LPIPS(VGG) is included when pretrained weights are available (see
        shacira_tpu.ops.lpips — bring-your-own .npz in a zero-egress env).
        """
        import os
        from shacira_tpu.ops import lpips as lpips_mod
        d = dataset if dataset is not None else self.dataset
        if view_indices is None:
            view_indices = range(d.num_views)
        lpips_w = None
        if os.environ.get(lpips_mod.ENV_VAR):
            lpips_w = lpips_mod.load_lpips_weights()
        psnrs, ssims, lpipses = [], [], []
        for v in view_indices:
            pred = self.render_view(v, dataset=d)
            gtv = d.rgb[v].reshape(d.h, d.w, 3)
            psnrs.append(float(float_psnr(jnp.asarray(pred), jnp.asarray(gtv))))
            ssims.append(float(ssim(pred, gtv)))
            if lpips_w is not None:
                lpipses.append(lpips_mod.lpips(np.clip(pred, 0, 1), gtv,
                                               weights=lpips_w))
        out = {'psnr': float(np.mean(psnrs)), 'ssim': float(np.mean(ssims))}
        if lpipses:
            out['lpips'] = float(np.mean(lpipses))
        return out

    def size_report(self, use_codec: bool = False, params=None):
        """Latent/decoder/total size accounting in kB (the reference logs
        latent/total size per epoch, multiview_trainer.py:164-169).

        Alternative backbones report their own accounting: VQAD =
        entropy-coded argmax indices + dictionary fp bits (ref
        codebook_grid.py:238-270), octree/triplanar = raw fp bits."""
        from shacira_tpu.models import mlp as mlp_mod
        from shacira_tpu.models.grids import octree_grid as og
        from shacira_tpu.models.grids import triplanar_grid as tg
        from shacira_tpu.models.grids.latent_grid import LatentGridConfig
        params = params if params is not None else self.params
        gcfg = self.model_cfg.grid
        if not isinstance(gcfg, LatentGridConfig):
            rest = (mlp_mod.mlp_size_bits(params['decoder_density'])
                    + mlp_mod.mlp_size_bits(params['decoder_color']))
            if self.grid_kind == 'codebook':
                _, gbits = og.codebook_grid_size_bits(params['grid'],
                                                      use_codec=use_codec)
            elif self.grid_kind == 'octree':
                gbits = og.grid_size_bits(params['grid'])
            else:
                gbits = tg.grid_size_bits(params['grid'])
            return {'grid_size_kb': gbits / 8e3,
                    'remainder_size_kb': rest / 8e3,
                    'total_size_kb': (gbits + rest) / 8e3}
        # prob-model accounting only on the (final) codec pass — the
        # BitEstimator CDF evaluation is an eager device call
        has_pm = use_codec and 'prob_model' in params['grid']
        ldec_bits, latent_bits = lg.grid_size_bits(params['grid'], gcfg,
                                                   use_codec=use_codec,
                                                   count_side_info=has_pm)
        rest = (mlp_mod.mlp_size_bits(params['decoder_density'])
                + mlp_mod.mlp_size_bits(params['decoder_color']))
        out = {}
        if has_pm:
            # headline = smaller DECODABLE stream (see ImageTrainer
            # .size_report: the shared BitEstimator fits NeRF's multi-LOD
            # latent distribution far worse than the histogram)
            _, pm_bits = lg.grid_size_bits(params['grid'], gcfg,
                                           use_codec=use_codec,
                                           use_prob_model=True,
                                           count_side_info=True)
            out['latent_size_kb_hist'] = latent_bits / 8e3
            out['total_size_kb_hist'] = (ldec_bits + latent_bits
                                         + rest) / 8e3
            out['latent_size_kb_pm'] = pm_bits / 8e3
            out['stream'] = ('histogram' if latent_bits <= pm_bits
                             else 'prob_model')
            latent_bits = min(latent_bits, pm_bits)
        total = ldec_bits + latent_bits + rest
        out.update({'ldec_size_kb': ldec_bits / 8e3,
                    'latent_size_kb': latent_bits / 8e3,
                    'remainder_size_kb': rest / 8e3,
                    'total_size_kb': total / 8e3})
        return out
