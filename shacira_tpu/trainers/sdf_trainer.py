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
