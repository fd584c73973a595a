"""SDF trainer.

Equivalent of ``wisp/trainers/sdf_trainer.py:17-146`` (reference):
L2 loss on signed distances summed over the active loss LODs, IoU
validation.  Like the other trainers, chunks of steps run on-device under
``lax.scan`` with presampled batches.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.models.nefs import sdf as sdf_mod
from shacira_tpu.models.nefs.sdf import NeuralSDFConfig
from shacira_tpu.ops.sdf import compute_sdf_iou
from shacira_tpu import optim


@dataclass
class SDFTrainerConfig:
    epochs: int = 10
    lr: float = 0.001
    grid_lr: float = 0.02
    weight_decay: float = 0.0
    optimizer_type: str = 'adam'
    loss_lods: Tuple[int, ...] = ()   # empty -> max LOD only
    grow_every: int = -1              # epochs between LOD-growth stages
    growth_strategy: str = 'increase'  # onebyone|increase|shrink|finetocoarse|onlylast
    chunk_size: int = 50
    log_every: int = 1


class SDFTrainer:
    def __init__(self, cfg: SDFTrainerConfig, model_cfg: NeuralSDFConfig,
                 dataset, seed: int = 0):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.dataset = dataset
        self.rng = jax.random.PRNGKey(seed)
        self.np_rng = np.random.RandomState(seed)
        self.rng, k = jax.random.split(self.rng)

        def _init(key):
            params = sdf_mod.neural_sdf_init(key, model_cfg)
            return params, optim.adam_init(params)

        self.params, self.opt_state = jax.jit(_init)(k)
        self.labels = optim.label_params(self.params, optim.shacira_label_fn)
        self.iteration = 0
        self._fns = {}

        num_lods = model_cfg.grid.num_lods
        self.loss_lods = (tuple(cfg.loss_lods) if cfg.loss_lods
                          else (num_lods - 1,))

    def _current_loss_lods(self) -> Tuple[int, ...]:
        """Growth curricula (ref BaseTrainer.grow, base_trainer.py:348-364)."""
        cfg = self.cfg
        if cfg.grow_every <= 0:
            return self.loss_lods
        from shacira_tpu.core.schedulers import grow_loss_lods
        epoch = self.iteration // max(1, len(self.dataset))
        return tuple(grow_loss_lods(epoch, self.model_cfg.grid.num_lods,
                                    cfg.grow_every, cfg.growth_strategy))

    def _get_chunk_fn(self, loss_lods: Tuple[int, ...]):
        key = ('chunk', loss_lods)
        if key in self._fns:
            return self._fns[key]
        cfg, mcfg = self.cfg, self.model_cfg
        wd = {'grid': cfg.weight_decay}
        labels = self.labels
        num_lods = mcfg.grid.num_lods
        # per-LOD masks: loss at LOD l uses features of LODs <= l
        lod_masks = [
            jnp.asarray([1.0 if i <= l else 0.0 for i in range(num_lods)])
            for l in loss_lods]

        def step(params, opt_state, coords, gts):
            def loss_fn(p):
                total = 0.0
                for m in lod_masks:
                    pred = sdf_mod.neural_sdf(p, mcfg, coords, lod_mask=m)
                    total = total + jnp.sum((pred - gts) ** 2)
                return total / coords.shape[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            lrs = {'decoder': jnp.asarray(cfg.lr), 'grid': jnp.asarray(cfg.grid_lr),
                   'latent_dec': jnp.asarray(cfg.lr),
                   'prob_models': jnp.asarray(1e-4),
                   'rest': jnp.asarray(cfg.lr)}
            params, opt_state = optim.adam_update(
                grads, opt_state, params, labels, lrs, wd)
            return params, opt_state, loss

        def run_chunk(params, opt_state, xs):
            def body(carry, x):
                params, opt_state = carry
                params, opt_state, loss = step(params, opt_state,
                                               x['coords'], x['sdf'])
                return (params, opt_state), loss
            return jax.lax.scan(body, (params, opt_state), xs)

        fn = jax.jit(run_chunk, donate_argnums=(0, 1))
        self._fns[key] = fn
        return fn

    def train(self, num_iterations: Optional[int] = None, log_fn=None):
        cfg = self.cfg
        total = (num_iterations if num_iterations is not None
                 else cfg.epochs * len(self.dataset))
        t0 = time.time()
        done = 0
        while done < total:
            n = min(cfg.chunk_size, total - done)
            coords = np.empty((n, self.dataset.batch_size, 3), np.float32)
            sdfs = np.empty((n, self.dataset.batch_size, 1), np.float32)
            for i in range(n):
                coords[i], sdfs[i] = self.dataset.batch()
            xs = {'coords': jnp.asarray(coords), 'sdf': jnp.asarray(sdfs)}
            run = self._get_chunk_fn(self._current_loss_lods())
            (self.params, self.opt_state), losses = run(
                self.params, self.opt_state, xs)
            self.iteration += n
            done += n
            if log_fn:
                log_fn({'iteration': self.iteration,
                        'l2_loss': float(np.asarray(losses[-1:])[0]),
                        'elapsed': time.time() - t0})
        return {'iterations': self.iteration}

    def render(self, camera_origin=(-1.8, 1.2, -1.8), res=(256, 256),
               shading: str = 'normal', matcap=None,
               point_light=(1.5, 4.0, 1.5), min_y: float = -1.0,
               num_steps: int = 128) -> np.ndarray:
        """Sphere-trace a lookat view of the trained SDF.

        shading: 'normal' (ref shade_normals), 'matcap' (needs a texture,
        ref wisp/ops/shaders/matcap.py) or 'shadow' (ground plane +
        point-light shadow rays, ref wisp/ops/shaders/shadow_rays.py).
        Returns [H, W, 3] float32.
        """
        from shacira_tpu.core.rays import make_rays
        from shacira_tpu.render import offline, shaders
        from shacira_tpu.tracers import sdf_tracer
        from shacira_tpu.accel import occupancy as occ

        mcfg = self.model_cfg
        h, w = res
        cam = offline.CameraConfig(width=w, height=h)
        ro, rd = offline.lookat_rays(camera_origin, (0.0, 0.0, 0.0), cam)
        rays = make_rays(ro.reshape(-1, 3), rd.reshape(-1, 3),
                         cam.dist_min, cam.dist_max)

        ocfg = occ.OccupancyGridConfig(level=4)
        ostate = occ.occupancy_init(ocfg, occupied=True)
        tcfg = sdf_tracer.SDFTracerConfig(num_steps=num_steps)
        params = self.params

        @jax.jit
        def run(p, rays_):
            sdf_fn = lambda c: sdf_mod.neural_sdf(p, mcfg, c)
            grad_fn = jax.vmap(jax.grad(
                lambda c: sdf_mod.neural_sdf(p, mcfg, c[None])[0, 0]))
            out = sdf_tracer.trace(sdf_fn, ostate, ocfg, tcfg, rays_)
            return sdf_tracer.shade_normals(grad_fn, out)

        rb = run(params, rays)
        if shading == 'matcap':
            if matcap is None:
                raise ValueError('matcap shading needs a texture '
                                 '(shaders.load_matcap)')
            rb = shaders.matcap_shader(rb, rays, matcap)
            rb['rgb'] = rb['rgb'] * rb['alpha']
        elif shading == 'shadow':
            def trace_hit_fn(sr):
                sdf_fn = lambda c: sdf_mod.neural_sdf(params, mcfg, c)
                return sdf_tracer.trace(sdf_fn, ostate, ocfg, tcfg, sr)['hit']

            rb = shaders.shadow_shader(rb, rays, trace_hit_fn, point_light,
                                       min_y=min_y, image_shape=(h, w))
        elif shading != 'normal':
            raise ValueError(shading)
        return np.asarray(rb['rgb']).reshape(h, w, 3)

    def validate(self, num_batches: int = 4):
        """IoU validation over fresh pool batches (ref validate, :113-146)."""
        mcfg = self.model_cfg
        fwd = jax.jit(lambda p, c: sdf_mod.neural_sdf(p, mcfg, c))
        ious = []
        for _ in range(num_batches):
            coords, gts = self.dataset.batch()
            pred = np.asarray(fwd(self.params, jnp.asarray(coords)))
            ious.append(compute_sdf_iou(pred, gts))
        return {'iou': float(np.mean(ious))}
