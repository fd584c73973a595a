"""Image INR trainer (SHACIRA core path).

TPU-native re-design of ``wisp/trainers/image_trainer.py`` (reference):
the optimization step — latent norm recalibration, SGA/STE quantize + decode,
multi-LOD hash encode, MLP head, rate loss, Adam with 5 param groups and
dynamic grid-lr scaling — is a single XLA program, and *chunks of steps* run
on-device under ``lax.scan`` with the whole schedule (entropy λ, SGA
temperature, ldec lr, recalibration/noise flags) precomputed into per-step
arrays.  One host→device dispatch drives hundreds of epochs; best-state
tracking lives in the scan carry.

Reference semantics preserved:
  * loss = rgb_weight * MSE + λ(t) * avg_bits   (image_trainer.py:298-321)
  * λ cosine schedule, temperature exp schedule, SGA disabled after
    ``decay_period`` of training (image_trainer.py:128-137)
  * ``div`` recalibrated from latent statistics every ``norm_every``
    iterations (image_trainer.py:284-296; the reference's modulo is reversed —
    ``norm_every % t == 0`` — we implement the documented intent
    ``t % norm_every == 0``)
  * grid lr scaled by decoder scale-norm each step (image_trainer.py:326-347)
  * best state = params at lowest rgb loss (image_trainer.py:173-178)
  * per-epoch PSNR/BPP/total-size accounting; final size via a real
    arithmetic-coded stream (image_trainer.py:147-193, 471-514)
"""
from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.core.schedulers import DecayScheduler
from shacira_tpu.models.nefs.image import (
    NeuralImageConfig, neural_image_init, neural_image_rgb, non_grid_size_bits,
)
from shacira_tpu.models.grids import latent_grid as lg
from shacira_tpu.models.latent_decoders import recalibrate_div, scale_norm
from shacira_tpu.ops.image import clamped_psnr
from shacira_tpu.utils.rng import step_key
from shacira_tpu import optim


@dataclass
class ImageTrainerConfig:
    epochs: int = 60000
    rgb_loss_weight: float = 1.0
    # optimizer (kodak.yaml:61-70)
    optimizer_type: str = 'adam'
    lr: float = 0.001
    grid_lr: float = 0.02
    ldec_lr: float = 0.01
    scale_grid_lr: str = 'none'      # 'none' | 'mul' | 'div'
    weight_decay: float = 0.0
    weight_decay_decoder: float = 0.01
    ldec_lr_warmup: int = 10
    # latent decoder schedule (kodak.yaml:40-52)
    use_sga: bool = False
    decay_period: float = 0.9
    temperature: float = 0.1
    norm: str = 'none'
    norm_every: int = 10
    # entropy reg (kodak.yaml:54-59)
    entropy_reg: float = 0.0
    entropy_reg_end: float = 0.0
    entropy_reg_sched: str = 'cosine'
    noise_freq: int = 1
    # generator for the per-step full-codebook draws (see utils/rng.py)
    rng_impl: str = 'threefry'
    # dataset resampling for 'woreplace' (ref pre_epoch, image_trainer.py:119-121)
    resample: bool = False
    resample_every: int = 1
    # execution
    chunk_size: int = 500            # scan steps per device dispatch
    # sampled modes: draw batch indices ON DEVICE from an HBM-resident image
    # (TPU-native; avoids host presampling + per-chunk host->device batch
    # transfers, which dominate wreplace/woreplace throughput through a
    # remote relay).  Falls back to host batches when False.
    device_sampling: bool = True
    # keep the HBM-resident image as uint8 when that is lossless (the image
    # came from an 8-bit source): 4x less HBM + host->device transfer —
    # giga-images (pearl: 67 Mpix = 800 MB f32 vs 200 MB u8) otherwise
    # stress the relay; batches dequantize to f32 after the gather.
    device_image_u8: bool = True
    # logging / lifecycle (ref base_trainer.py:334,377-443)
    log_every: int = 1000
    valid_every: int = -1            # epochs between full-image validations
    save_every: int = -1             # epochs between resume_state.ckpt writes
    render_tb_every: int = -1        # epochs between TB image renders
    # LOD growth curriculum (ref BaseTrainer.grow, base_trainer.py:348-364):
    # active LODs follow grow_loss_lods; inactive LODs are feature-masked
    grow_every: int = -1
    growth_strategy: str = 'increase'


class ImageTrainer:
    """Trains one NeuralImage pipeline on one image."""

    def __init__(self, cfg: ImageTrainerConfig, model_cfg: NeuralImageConfig,
                 dataset, seed: int = 0, log_dir: Optional[str] = None,
                 mesh=None, logger=None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.dataset = dataset
        self.log_dir = log_dir
        self.mesh = mesh
        self.logger = logger          # optional ExperimentLogger
        self.rng = jax.random.PRNGKey(seed)

        self.rng, k_init = jax.random.split(self.rng)

        # one jitted program for the whole init: eager op dispatch is expensive
        # on remote-tunneled TPU backends
        def _init(k):
            params = neural_image_init(k, model_cfg)
            return (params, optim.adam_init(params),
                    jnp.zeros_like(params['grid']['codebook']))

        self.params, self.opt_state, self.noise = jax.jit(_init)(k_init)
        self.labels = optim.label_params(self.params, optim.shacira_label_fn)

        gcfg = model_cfg.grid
        self.ldecode_enabled = gcfg.ldec is not None
        self.entropy_enabled = self.ldecode_enabled and gcfg.entropy_enabled

        n = cfg.epochs
        self.entropy_reg_sched = DecayScheduler(
            n, cfg.entropy_reg_sched, cfg.entropy_reg, cfg.entropy_reg_end,
            params={'decay_period': cfg.decay_period, 'temperature': cfg.temperature})
        self.temperature_sched = DecayScheduler(
            n, 'exp', 1.0, cfg.temperature,
            params={'temperature': cfg.temperature, 'decay_period': cfg.decay_period})
        # image trainer pins the ldec lr (image_trainer.py:39)
        self.ldec_lr_sched = DecayScheduler(cfg.ldec_lr_warmup, 'fix', cfg.ldec_lr)

        # static-coords fast path: on the full pixel lattice the encode
        # factorizes into butterfly + separable matmuls (ops/lattice.py) —
        # no gathers/scatters at all
        self.plan_meta = None
        self.plan_arrays = None
        # gate on the top LOD resolution: the lattice factorization
        # materializes per-LOD [res, res, F] dense slices (plus butterfly
        # backward temps of the same order), so giga-image grids
        # (pearl: max_grid_res 10725) would allocate tens of GB of HLO
        # temps — those configs stay on the gather path
        if (getattr(dataset, 'static_coords', False)
                and model_cfg.grid.spec.resolutions[-1] <= 4096):
            from shacira_tpu.ops.lattice import build_image_lattice
            self.plan_meta, arrays = build_image_lattice(
                dataset.h, dataset.w, model_cfg.grid.spec)
            self.plan_arrays = arrays

        self.epoch = 0
        # device-side best-state: (rgb_loss, psnr, params) in the scan carry;
        # a distinct copy since params and best_params are both donated
        self.best_loss, self.best_psnr, self.best_params = jax.jit(
            lambda p: (jnp.asarray(np.inf, jnp.float32),
                       jnp.asarray(0.0, jnp.float32),
                       jax.tree.map(jnp.copy, p)))(self.params)
        # validation-time best (ref image_trainer.py:434-442: model_best by
        # validation loss); host-side, only populated when valid_every > 0
        self.best_val_psnr = -np.inf
        self.val_best_params = None
        self.history = []
        self._fns = {}

    # ------------------------------------------------------------------
    def _raw_step(self, use_sga: bool):
        """One training step; pure function of (state, batch, schedule scalars)."""
        cfg, mcfg = self.cfg, self.model_cfg
        gcfg = mcfg.grid
        wd = {'decoder': 0.0, 'grid': cfg.weight_decay,
              'latent_dec': cfg.weight_decay_decoder,
              'prob_models': cfg.weight_decay_decoder, 'rest': 0.0}
        decoupled = cfg.optimizer_type == 'adamw'
        labels = self.labels
        entropy_on = self.entropy_enabled

        plan_meta = self.plan_meta

        def step(params, opt_state, noise, coords, gt, plan_arrays, rng,
                 ent_lambda, temperature, lr_ldec, do_recalib, refresh_noise,
                 lod_mask):
            k_sga, k_noise = jax.random.split(rng)
            # bulk full-codebook draws ride the configured generator
            # (utils/rng.py — hardware RngBitGenerator when 'unsafe_rbg')
            k_sga = step_key(k_sga, cfg.rng_impl)
            k_noise = step_key(k_noise, cfg.rng_impl)

            # latent norm recalibration (pre-forward, ref :284-296; the
            # reference applies it only to the single LatentDecoder, :287)
            if (self.ldecode_enabled and cfg.norm != 'none'
                    and mcfg.grid.ldecode_type == 'single'):
                ld = params['grid']['latent_dec']
                new_ld = recalibrate_div(ld, params['grid']['codebook'], cfg.norm)
                div = jnp.where(do_recalib, new_ld['div'], ld['div'])
                params = {**params, 'grid': {**params['grid'],
                                             'latent_dec': {**ld, 'div': div}}}

            # rate-loss noise refresh (ref latent_grid.py:126-131);
            # cond, not where: skip the full-table draw on non-refresh steps
            if entropy_on:
                noise = jax.lax.cond(
                    refresh_noise,
                    lambda nz: jax.random.uniform(k_noise, nz.shape) - 0.5,
                    lambda nz: nz, noise)

            def loss_fn(p):
                encoder = None
                affine = None
                if plan_arrays is not None:
                    from shacira_tpu.ops.lattice import lattice_encode
                    encoder = lambda decoded: lattice_encode(
                        plan_arrays, decoded, plan_meta)
                elif lg.supports_affine_fusion(gcfg):
                    # sampled mode: latent-width fused backward
                    affine = lg.affine_parts(p['grid'], gcfg, use_sga=use_sga,
                                             temperature=temperature, rng=k_sga)
                pred = neural_image_rgb(p, mcfg, coords, use_sga=use_sga,
                                        temperature=temperature, rng=k_sga,
                                        encoder=encoder, affine=affine,
                                        lod_mask=lod_mask)
                rgb_loss = jnp.mean((pred - gt) ** 2)
                loss = cfg.rgb_loss_weight * rgb_loss
                aux = {'rgb_loss': rgb_loss, 'pred': pred}
                if entropy_on:
                    avg_bits, total_bits = lg.ent_loss(p['grid'], gcfg, noise)
                    loss = loss + ent_lambda * avg_bits
                    aux['ent_loss'] = ent_lambda * avg_bits
                    aux['total_bits'] = total_bits
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

            # dynamic grid-lr scaling (ref :326-347)
            lr_grid = jnp.asarray(cfg.grid_lr, jnp.float32)
            if (self.ldecode_enabled and cfg.scale_grid_lr != 'none'
                    and mcfg.grid.ldecode_type == 'single'):
                norm = scale_norm(params['grid']['latent_dec'])
                if cfg.scale_grid_lr == 'mul':
                    lr_grid = lr_grid * norm
                elif cfg.scale_grid_lr == 'div':
                    lr_grid = lr_grid / norm

            lrs = {'decoder': jnp.asarray(cfg.lr, jnp.float32),
                   'grid': lr_grid,
                   'latent_dec': lr_ldec,
                   'prob_models': jnp.asarray(1.0e-4, jnp.float32),
                   'rest': jnp.asarray(cfg.lr, jnp.float32)}
            params, opt_state = optim.adam_update(
                grads, opt_state, params, labels, lrs, wd, decoupled=decoupled)
            metrics = {'loss': loss, 'rgb_loss': aux['rgb_loss'],
                       'psnr': clamped_psnr(aux['pred'], gt)}
            if entropy_on:
                metrics['ent_loss'] = aux['ent_loss']
                metrics['total_bits'] = aux['total_bits']
            return params, opt_state, noise, metrics

        return step

    def _get_chunk_fn(self, use_sga: bool):
        """Jitted scan over a chunk of steps (single dispatch per chunk)."""
        key = ('chunk', use_sga)
        if key in self._fns:
            return self._fns[key]
        step = self._raw_step(use_sga)

        def run_chunk(params, opt_state, noise, best_loss, best_psnr,
                      best_params, coords, gt, plan_arrays, xs):
            # coords/gt/plan are closed over by the body -> scan loop
            # invariants; sampled mode passes per-step batches in xs instead
            def body(carry, x):
                params, opt_state, noise, best_loss, best_psnr, best_params = carry
                step_coords = x.get('coords', coords)
                step_gt = x.get('gt', gt)
                params, opt_state, noise, metrics = step(
                    params, opt_state, noise, step_coords, step_gt,
                    plan_arrays, x['rng'],
                    x['ent_lambda'], x['temperature'], x['lr_ldec'],
                    x['do_recalib'], x['refresh_noise'], x['lod_mask'])
                better = metrics['rgb_loss'] < best_loss
                best_loss = jnp.where(better, metrics['rgb_loss'], best_loss)
                best_psnr = jnp.where(better, metrics['psnr'], best_psnr)
                best_params = jax.tree.map(
                    lambda new, old: jnp.where(better, new, old), params, best_params)
                return (params, opt_state, noise, best_loss, best_psnr,
                        best_params), metrics

            return jax.lax.scan(
                body, (params, opt_state, noise, best_loss, best_psnr, best_params), xs)

        fn = jax.jit(run_chunk, donate_argnums=(0, 1, 2, 3, 4, 5))
        self._fns[key] = fn
        return fn

    def _get_device_chunk_fn(self, use_sga: bool, mode: str):
        """Chunked scan with ON-DEVICE batch sampling (sampled modes).

        The full image lives in HBM ([P, 3] loop invariant); each scan step
        draws its pixel indices on device — 'wreplace' from the step RNG,
        'woreplace'/'sequential' as a dynamic slice of a device-resident
        permutation at ``x['sample_base']`` (dynamic_slice clamps the start,
        so tail batches overlap the previous batch instead of padding).
        No per-step host arrays, no host->device batch traffic.  Under a
        mesh the drawn batch is sharded across the data axis (image/perm
        replicated; XLA partitions the encode and psums parameter grads).
        """
        u8 = getattr(self, '_dev_u8', False)
        key = ('dev_chunk', use_sga, mode, u8)
        if key in self._fns:
            return self._fns[key]
        step = self._raw_step(use_sga)
        h, w = self.dataset.h, self.dataset.w
        p_total = self.dataset.num_pixels
        ns = self.dataset.num_samples
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from shacira_tpu.parallel.mesh import DATA_AXIS
            assert ns % mesh.size == 0, (
                f'num_samples {ns} must divide mesh size {mesh.size}')
            batch_sh = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

        def run_chunk(params, opt_state, noise, best_loss, best_psnr,
                      best_params, img_flat, perm, xs):
            def body(carry, x):
                params, opt_state, noise, best_loss, best_psnr, best_params = carry
                k_batch, k_step = jax.random.split(x['rng'])
                if mode == 'wreplace':
                    idx = jax.random.randint(k_batch, (ns,), 0, p_total)
                else:
                    idx = jax.lax.dynamic_slice(perm, (x['sample_base'],),
                                                (ns,))
                if mesh is not None:
                    idx = jax.lax.with_sharding_constraint(idx, batch_sh)
                rr = (idx // w).astype(jnp.float32)
                cc = (idx % w).astype(jnp.float32)
                coords = jnp.stack([(rr / h - 0.5) * 2.0,
                                    (cc / w - 0.5) * 2.0], axis=-1)
                gt = jnp.take(img_flat, idx, axis=0)
                if u8:
                    # exact dequant via a 256-entry LUT: k * (1/255) and
                    # reciprocal-multiply lowerings differ from
                    # float32(k/255) by an ulp for some k; the LUT
                    # reproduces the f32-resident values bit-for-bit
                    lut = jnp.asarray(
                        (np.arange(256) / 255.0).astype(np.float32))
                    gt = jnp.take(lut, gt.astype(jnp.int32))
                params, opt_state, noise, metrics = step(
                    params, opt_state, noise, coords, gt, None, k_step,
                    x['ent_lambda'], x['temperature'], x['lr_ldec'],
                    x['do_recalib'], x['refresh_noise'], x['lod_mask'])
                better = metrics['rgb_loss'] < best_loss
                best_loss = jnp.where(better, metrics['rgb_loss'], best_loss)
                best_psnr = jnp.where(better, metrics['psnr'], best_psnr)
                best_params = jax.tree.map(
                    lambda new, old: jnp.where(better, new, old), params,
                    best_params)
                return (params, opt_state, noise, best_loss, best_psnr,
                        best_params), metrics

            return jax.lax.scan(
                body, (params, opt_state, noise, best_loss, best_psnr,
                       best_params), xs)

        fn = jax.jit(run_chunk, donate_argnums=(0, 1, 2, 3, 4, 5))
        self._fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    def _schedule_arrays(self, e0: int, n: int, epochs=None, iters=None):
        cfg = self.cfg
        epochs = np.arange(e0, e0 + n) if epochs is None else np.asarray(epochs)
        iters = epochs if iters is None else np.asarray(iters)
        ent = np.asarray([self.entropy_reg_sched(e) for e in epochs], np.float32) \
            if self.entropy_enabled else np.zeros(n, np.float32)
        temp = np.asarray([self.temperature_sched(e) for e in epochs], np.float32) \
            if self.ldecode_enabled else np.ones(n, np.float32)
        lr_ldec = np.asarray([self.ldec_lr_sched(e) for e in epochs], np.float32)
        recal = (np.asarray(iters % cfg.norm_every == 0)
                 if (self.ldecode_enabled and cfg.norm != 'none')
                 else np.zeros(n, bool))
        refresh = (np.asarray((iters - 1) % max(cfg.noise_freq, 1) == 0)
                   if self.entropy_enabled else np.zeros(n, bool))
        num_lods = self.model_cfg.grid.num_lods
        if cfg.grow_every > 0:
            from shacira_tpu.core.schedulers import grow_loss_lods
            masks = np.zeros((n, num_lods), np.float32)
            for i, e in enumerate(epochs):
                masks[i, grow_loss_lods(int(e), num_lods, cfg.grow_every,
                                        cfg.growth_strategy)] = 1.0
        else:
            masks = np.ones((n, num_lods), np.float32)
        return {'ent_lambda': jnp.asarray(ent), 'temperature': jnp.asarray(temp),
                'lr_ldec': jnp.asarray(lr_ldec), 'do_recalib': jnp.asarray(recal),
                'refresh_noise': jnp.asarray(refresh),
                'lod_mask': jnp.asarray(masks)}

    def _use_sga_at(self, e: int) -> bool:
        cfg = self.cfg
        return (self.ldecode_enabled and cfg.use_sga
                and (e / cfg.epochs) <= cfg.decay_period)

    def train(self, epochs: Optional[int] = None, log_fn=None,
              finalize: bool = True):
        """Run the training loop.  Returns the best-state summary dict
        (or None when ``finalize=False`` — e.g. timing segments).

        Default epoch count is the configured END minus already-run epochs
        (absolute), so resuming from a checkpoint finishes the schedule
        instead of restarting its count."""
        cfg = self.cfg
        epochs = (epochs if epochs is not None
                  else max(0, cfg.epochs - self.epoch))
        ds = self.dataset
        if not ds.static_coords:
            return self._train_sampled(epochs, log_fn, finalize)
        if self.plan_meta is not None:
            # lattice mode computes predictions in canonical row-major pixel
            # order, so feed the unshuffled image
            from shacira_tpu.datasets.image import pixel_coords
            coords = jnp.asarray(pixel_coords(ds.h, ds.w))
            gt = jnp.asarray(ds.rgb)
        else:
            coords = jnp.asarray(ds.batch(0)[0])
            gt = jnp.asarray(ds.batch(0)[1])
        if self.mesh is not None:
            from shacira_tpu.parallel import mesh as pmesh
            n_dev = self.mesh.size
            assert coords.shape[0] % n_dev == 0, (
                f'pixel count {coords.shape[0]} must divide mesh size {n_dev}')
            coords, gt = pmesh.shard_batch(self.mesh, coords, gt)
            for attr in ('params', 'opt_state', 'noise', 'best_params'):
                setattr(self, attr, pmesh.replicate(self.mesh, getattr(self, attr)))

        t0 = time.time()
        done = 0
        max_chunk = max(1, cfg.chunk_size if cfg.log_every <= 0
                        else min(cfg.chunk_size, cfg.log_every))
        while done < epochs:
            e0 = self.epoch + 1
            use_sga = self._use_sga_at(e0)
            n = min(max_chunk, epochs - done)
            # keep use_sga constant within a chunk (it flips once at decay_period)
            if use_sga:
                flip = int(np.floor(cfg.decay_period * cfg.epochs))
                n = min(n, max(1, flip - e0 + 1))
            n = self._cadence_clip(e0, n)
            xs = self._schedule_arrays(e0, n)
            self.rng, k = jax.random.split(self.rng)
            xs['rng'] = jax.random.split(k, n)

            run = self._get_chunk_fn(use_sga)
            carry, metrics = run(self.params, self.opt_state, self.noise,
                                 self.best_loss, self.best_psnr, self.best_params,
                                 coords, gt, self.plan_arrays, xs)
            (self.params, self.opt_state, self.noise,
             self.best_loss, self.best_psnr, self.best_params) = carry
            self.epoch += n
            done += n

            if cfg.log_every > 0 and (self.epoch % cfg.log_every == 0
                                      or done >= epochs):
                entry = self.size_report(use_codec=False)
                # fetch 1-element slices (0-d readbacks stall on some backends)
                entry.update(epoch=self.epoch,
                             psnr=float(np.asarray(metrics['psnr'][-1:])[0]),
                             rgb_loss=float(np.asarray(metrics['rgb_loss'][-1:])[0]),
                             best_psnr=float(np.asarray(self.best_psnr[None])[0]),
                             elapsed=time.time() - t0)
                if self.entropy_enabled:
                    entry['ent_loss'] = float(np.asarray(metrics['ent_loss'][-1:])[0])
                self.history.append(entry)
                if self.logger is not None:
                    for k in ('psnr', 'rgb_loss', 'bpp', 'total_size_kb',
                              'rounding_loss'):
                        self.logger.scalar(f'train/{k}', entry[k], self.epoch)
                if log_fn:
                    log_fn(entry)
            self._post_chunk(at_epoch_boundary=True, log_fn=log_fn)
        return self.finalize() if finalize else None

    # ------------------------------------------------------------------
    def _cadence_clip(self, e0: int, n: int) -> int:
        """Stop chunks at lifecycle boundaries so periodic validation /
        checkpointing / TB renders run at exact epochs
        (ref base_trainer.py:334,377-443)."""
        cfg = self.cfg
        for every in (cfg.valid_every, cfg.save_every, cfg.render_tb_every):
            if every and every > 0:
                nxt = ((e0 - 1) // every + 1) * every
                n = min(n, max(1, nxt - e0 + 1))
        return n

    def _post_chunk(self, at_epoch_boundary: bool, log_fn=None):
        """Periodic lifecycle work after a chunk of steps: validation
        (valid_every), resume-state checkpoint (save_every), TB image render
        (render_tb_every)."""
        if not at_epoch_boundary:
            return
        cfg = self.cfg
        e = self.epoch
        if cfg.valid_every > 0 and e % cfg.valid_every == 0:
            m = self.validate()
            if self.logger is not None:
                self.logger.scalar('valid/psnr', m['psnr'], e)
            if log_fn:
                log_fn({'epoch': e, 'valid_psnr': m['psnr'],
                        'best_val_psnr': self.best_val_psnr})
        if (cfg.render_tb_every > 0 and e % cfg.render_tb_every == 0
                and self.logger is not None):
            self.logger.image('render/pred', self.render(), e)
        if cfg.save_every > 0 and e % cfg.save_every == 0 and self.log_dir:
            from shacira_tpu.utils import checkpoint
            checkpoint.save_trainer(
                self, os.path.join(self.log_dir, 'resume_state.ckpt'))

    def validate(self) -> Dict[str, float]:
        """Full-image eval-mode (rounded latents) validation; tracks the
        best-by-validation state for model_best (ref image_trainer.py:377-469
        + :434-442)."""
        pred = self.render()
        ds = self.dataset
        gt = np.asarray(ds.rgb, np.float32).reshape(ds.h, ds.w, 3)
        p = clamped_psnr(jnp.asarray(pred.reshape(-1, 3)),
                         jnp.asarray(gt.reshape(-1, 3)))
        psnr = float(np.asarray(p[None])[0])
        if psnr > self.best_val_psnr:
            self.best_val_psnr = psnr
            self.val_best_params = jax.tree.map(np.asarray, self.params)
        return {'psnr': psnr, 'epoch': self.epoch}

    def _train_sampled(self, epochs: int, log_fn, finalize: bool):
        """Sampled-batch loop for 'wreplace'/'woreplace'/'sequential' modes
        (large images, ref pearl.yaml; one epoch = len(dataset) batches)."""
        cfg = self.cfg
        ds = self.dataset
        batches_per_epoch = len(ds)
        total = epochs * batches_per_epoch
        t0 = time.time()
        done = 0
        use_device = (cfg.device_sampling
                      and ds.sample_mode in ('wreplace', 'woreplace',
                                             'sequential')
                      and (self.mesh is None
                           or ds.num_samples % self.mesh.size == 0))
        if use_device and self.mesh is not None and not hasattr(self, '_dev_img'):
            from shacira_tpu.parallel import mesh as pmesh
            for attr in ('params', 'opt_state', 'noise', 'best_params'):
                setattr(self, attr,
                        pmesh.replicate(self.mesh, getattr(self, attr)))
        if use_device and not hasattr(self, '_dev_img'):
            # HBM-resident image + batch permutation (device sampling).  For
            # 'woreplace'/'sequential' the dataset's shuffle_idx is the
            # permutation, so batch contents match the host path exactly
            # (except tail batches: dynamic_slice clamps the start, so the
            # tail overlaps the previous batch instead of repeating the
            # batch head).  'wreplace' draws from the jax PRNG instead of
            # the dataset's numpy stream (same distribution).
            self._dev_u8 = False
            rgb = np.asarray(ds.rgb, np.float32)
            if cfg.device_image_u8:
                q = rgb * 255.0
                qr = np.rint(q)
                if float(np.abs(q - qr).max()) < 1e-3:   # 8-bit source
                    self._dev_img = jnp.asarray(qr.astype(np.uint8))
                    self._dev_u8 = True
            if not self._dev_u8:
                self._dev_img = jnp.asarray(rgb)
            self._dev_perm = (jnp.asarray(ds.shuffle_idx, jnp.int32)
                              if ds.shuffle_idx is not None
                              else jnp.zeros((1,), jnp.int32))
            if self.mesh is not None:
                from shacira_tpu.parallel import mesh as pmesh
                self._dev_img, self._dev_perm = pmesh.replicate(
                    self.mesh, (self._dev_img, self._dev_perm))
        self._resampled_epoch = getattr(self, '_resampled_epoch', 1)
        while done < total:
            e0 = self.epoch + 1
            if (cfg.resample and e0 > self._resampled_epoch
                    and hasattr(ds, 'resample')
                    and (e0 - 1) % max(1, cfg.resample_every) == 0):
                ds.resample()
                if use_device and ds.shuffle_idx is not None:
                    self._dev_perm = jnp.asarray(ds.shuffle_idx, jnp.int32)
                    if self.mesh is not None:
                        from shacira_tpu.parallel import mesh as pmesh
                        self._dev_perm = pmesh.replicate(self.mesh,
                                                         self._dev_perm)
                self._resampled_epoch = e0
            use_sga = self._use_sga_at(e0)
            n = min(max(1, cfg.chunk_size), total - done)
            if use_sga:
                # flip boundary in ITERATIONS from the exact iteration count
                # `done` (using the rounded epoch drifts by up to a chunk when
                # chunk_size doesn't divide batches_per_epoch)
                flip = int(np.floor(cfg.decay_period * cfg.epochs)) * batches_per_epoch
                n = min(n, max(1, flip - done))
            for every in (cfg.valid_every, cfg.save_every, cfg.render_tb_every):
                if every and every > 0:
                    nxt = (((e0 - 1) // every) + 1) * every * batches_per_epoch
                    n = min(n, max(1, nxt - done))
            # schedules keyed by epoch; recal/noise flags keyed by iteration
            iters = np.arange(done + 1, done + n + 1)
            ep = (iters - 1) // batches_per_epoch + 1
            xs = self._schedule_arrays(0, n, epochs=ep, iters=iters)
            self.rng, k = jax.random.split(self.rng)
            xs['rng'] = jax.random.split(k, n)
            if use_device:
                base = (((iters - 1) % batches_per_epoch)
                        * ds.num_samples).astype(np.int32)
                xs['sample_base'] = jnp.asarray(base)
                run = self._get_device_chunk_fn(use_sga, ds.sample_mode)
                carry, metrics = run(self.params, self.opt_state, self.noise,
                                     self.best_loss, self.best_psnr,
                                     self.best_params, self._dev_img,
                                     self._dev_perm, xs)
            else:
                bc = np.empty((n, ds.num_samples, 2), np.float32)
                bg = np.empty((n, ds.num_samples, 3), np.float32)
                for i in range(n):
                    c, g = ds.batch((done + i) % batches_per_epoch)
                    if c.shape[0] < ds.num_samples:   # pad tail batches
                        pad = ds.num_samples - c.shape[0]
                        c = np.concatenate([c, c[:pad]])
                        g = np.concatenate([g, g[:pad]])
                    bc[i], bg[i] = c, g
                xs['coords'] = jnp.asarray(bc)
                xs['gt'] = jnp.asarray(bg)

                run = self._get_chunk_fn(use_sga)
                carry, metrics = run(self.params, self.opt_state, self.noise,
                                     self.best_loss, self.best_psnr,
                                     self.best_params, None, None, None, xs)
            (self.params, self.opt_state, self.noise,
             self.best_loss, self.best_psnr, self.best_params) = carry
            prev_epoch = self.epoch
            done += n
            self.epoch = done // batches_per_epoch
            crossed = self.epoch != prev_epoch
            if cfg.log_every > 0 and log_fn and (
                    (crossed and self.epoch % cfg.log_every == 0)
                    or done >= total):
                entry = {'epoch': self.epoch, 'iteration': done,
                         'psnr': float(np.asarray(metrics['psnr'][-1:])[0]),
                         'rgb_loss': float(np.asarray(metrics['rgb_loss'][-1:])[0]),
                         'elapsed': time.time() - t0}
                if self.logger is not None:
                    for k in ('psnr', 'rgb_loss'):
                        self.logger.scalar(f'train/{k}', entry[k], done)
                log_fn(entry)
            self._post_chunk(at_epoch_boundary=crossed, log_fn=log_fn)
        return self.finalize() if finalize else None

    # ------------------------------------------------------------------
    def size_report(self, use_codec: bool, params=None) -> Dict[str, float]:
        """BPP/size accounting (ref image_trainer.py:147-171).

        Headline latent size is the PROB-MODEL-CDF stream when the grid has
        a BitEstimator — it is decodable with no per-image side information
        beyond the (counted) model parameters.  The histogram variant the
        reference reports (latent_grid.py:168-172) is also given, with its
        alphabet+CDF side info counted (``*_hist``), since a histogram
        stream alone cannot be decoded."""
        params = params if params is not None else self.params
        gcfg = self.model_cfg.grid
        # prob-model accounting only on the (final) codec pass: the
        # BitEstimator CDF evaluation is an eager device call — too slow
        # for the per-epoch histogram-estimate log line on the TPU relay
        has_pm = (use_codec and self.ldecode_enabled
                  and 'prob_model' in params['grid'])
        ldec_bits, latent_bits = lg.grid_size_bits(
            params['grid'], gcfg, use_codec=use_codec,
            count_side_info=has_pm)
        rest_bits = non_grid_size_bits(params)
        npix = self.dataset.h * self.dataset.w
        cb = np.asarray(params['grid']['codebook'])
        out = {}
        if has_pm:
            # both DECODABLE streams: histogram + transmitted alphabet/CDF
            # side info, and prob-model CDF + BitEstimator params.  The
            # headline is whichever is smaller — the shared-across-LODs
            # BitEstimator can fit a multi-modal latent distribution far
            # worse than the empirical histogram (NeRF lego: 719 vs
            # 155 kB), while on image configs the two are close.
            _, pm_bits = lg.grid_size_bits(
                params['grid'], gcfg, use_codec=use_codec,
                use_prob_model=True, count_side_info=True)
            out['latent_size_kb_hist'] = latent_bits / 8e3
            out['total_size_kb_hist'] = (
                ldec_bits + latent_bits + rest_bits) / 8e3
            out['bpp_hist'] = (ldec_bits + latent_bits + rest_bits) / npix
            out['latent_size_kb_pm'] = pm_bits / 8e3
            # reference-style accounting (histogram stream with NO side
            # info, latent_grid.py:168-172 in the ref) so apples-to-apples
            # comparison against reference-reported sizes stays one field
            # away (ADVICE r4)
            out['latent_size_kb_ref'] = (
                latent_bits - lg.stream_side_info_bits(params['grid'])) / 8e3
            out['stream'] = ('histogram' if latent_bits <= pm_bits
                             else 'prob_model')
            latent_bits = min(latent_bits, pm_bits)
        total = ldec_bits + latent_bits + rest_bits
        out.update({
            'ldec_size_kb': ldec_bits / 8e3,
            'latent_size_kb': latent_bits / 8e3,
            'remainder_size_kb': rest_bits / 8e3,
            'total_size_kb': total / 8e3,
            'bpp': total / npix,
            'rounding_loss': float(np.mean(np.abs(cb - np.round(cb))))
            if self.ldecode_enabled else 0.0,
        })
        return out

    # giga-image render tiling: one jit call on all coords would allocate
    # npix x (encode width + hidden) activations (67 Mpix pearl: >10 GB) —
    # chunk the prediction when the image exceeds this many pixels
    RENDER_CHUNK_PIX = 4 * 1024 * 1024

    def render(self, params=None) -> np.ndarray:
        """Full-image prediction in row-major [H, W, 3] (eval path: STE round)."""
        params = params if params is not None else self.params
        ds = self.dataset
        from shacira_tpu.datasets.image import pixel_coords
        coords = np.asarray(pixel_coords(ds.h, ds.w))
        encoder = None
        if self.plan_meta is not None:
            from shacira_tpu.ops.lattice import lattice_encode
            meta = self.plan_meta
            arrays = self.plan_arrays
            encoder = lambda decoded: lattice_encode(arrays, decoded, meta)
        fn = jax.jit(functools.partial(
            neural_image_rgb, cfg=self.model_cfg, use_sga=False,
            encoder=encoder))
        npix = coords.shape[0]
        if encoder is not None or npix <= self.RENDER_CHUNK_PIX:
            pred = np.asarray(fn(params, coords=jnp.asarray(coords)))
            return pred.reshape(ds.h, ds.w, 3)
        # fixed-size tiles (one compiled shape); the tail tile overlaps
        chunk = self.RENDER_CHUNK_PIX
        pred = np.empty((npix, 3), np.float32)
        for s in range(0, npix, chunk):
            e = min(s + chunk, npix)
            s0 = e - chunk
            out = np.asarray(fn(params, coords=jnp.asarray(coords[s0:e])))
            pred[s:e] = out[s - s0:]
        return pred.reshape(ds.h, ds.w, 3)

    def finalize(self) -> Dict:
        """Best-state metrics with real arithmetic-coded size (ref :471-514)."""
        best_params = jax.tree.map(np.asarray, self.best_params)
        report = self.size_report(use_codec=True, params=best_params)
        out = {'PSNR': float(np.asarray(self.best_psnr[None])[0]),
               'rgb_loss': float(np.asarray(self.best_loss[None])[0]),
               'epoch': self.epoch,
               'BPP': report['bpp'], **report}
        if self.val_best_params is not None:
            out['best_val_psnr'] = self.best_val_psnr
        if self.log_dir:
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.log_dir, 'metrics.json'), 'w') as f:
                json.dump(out, f, indent=2)
        return out
