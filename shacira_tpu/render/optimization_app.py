"""Train-while-viewing: the interactive-optimization loop.

Equivalent of the reference's ``OptimizationApp``
(wisp/renderer/app/optimization_app.py:19-108): the GL app runs
``trainer.iterate`` as a background task between redraws.  Here the roles
flip to fit the web viewer (render/web_viewer.py): training chunks run on
a background thread, and the HTTP viewer renders every frame against the
trainer's LATEST parameters — so the user watches the field converge live.

Usage:
    app = OptimizationApp.from_multiview(trainer, port=8008)
    app.run(num_iterations=...)    # trains; browse http://localhost:8008
"""
from __future__ import annotations

import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from shacira_tpu.render.offline import CameraConfig
from shacira_tpu.render.web_viewer import ViewerServer


class OptimizationApp:
    """Couples a chunked trainer with the interactive viewer.

    Args:
        trainer: object with ``train(num_iterations=, log_fn=)`` whose
            parameters advance between chunks (Image/Multiview/SDF trainers).
        make_trace_fn: params -> (rays, key) -> buffer dict.  Called with a
            fresh parameter snapshot per rendered frame.
        camera / port / layers: forwarded to :class:`ViewerServer`.
    """

    def __init__(self, trainer, make_trace_fn: Callable,
                 camera: CameraConfig = CameraConfig(width=256, height=256),
                 port: int = 8008, layers=None):
        self.trainer = trainer
        self._make_trace_fn = make_trace_fn
        self._last_entry = {}

        def live_trace(rays, key):
            return make_trace_fn(trainer.params)(rays, key)

        def stats():
            # optimization-progress + object-property panels (imgui
            # widget parity; ref widget_optimization.py)
            opt = {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in self._last_entry.items()}
            obj = {}
            mcfg = getattr(trainer, 'model_cfg', None)
            grid = getattr(mcfg, 'grid', None) if mcfg else None
            if grid is not None:
                obj['grid'] = type(grid).__name__
                obj['num_lods'] = grid.num_lods
                obj['table_rows'] = grid.spec.total_size
                obj['hash_layout'] = getattr(grid, 'hash_layout', 'xor')
            # occupancy arrives via the training log entries ('occupancy'
            # key) — computing it here would run an eager reduction per
            # poll (~0.6 s each through the TPU relay)
            return {'optimization': opt, 'object': obj}

        self.server = ViewerServer(live_trace, camera, port=port,
                                   layers=layers, stats_fn=stats)
        self._train_err = None

    @classmethod
    def from_multiview(cls, trainer, camera=CameraConfig(width=256,
                                                         height=256),
                       port: int = 8008, layers=None):
        """Viewer over a MultiviewTrainer's radiance field (eval-mode
        rounded decode, like the reference's interactive renderers)."""
        from shacira_tpu.models.grids import latent_grid as lg
        from shacira_tpu.models.nefs import nerf as nerf_mod
        from shacira_tpu.tracers import rf_tracer
        mcfg = trainer.model_cfg
        tcfg = trainer.tracer_cfg

        @jax.jit
        def render(params, occ_state, ro, rd, dmin, dmax, key):
            from shacira_tpu.core.rays import make_rays
            parts = lg.affine_parts(params['grid'], mcfg.grid)
            rays = make_rays(ro, rd, dmin, dmax)
            return rf_tracer.trace(
                lambda c, d: nerf_mod.nerf_rgba(params, mcfg, c, d,
                                                affine=parts),
                occ_state, mcfg.occ_cfg, tcfg, rays, key)

        d = trainer.dataset

        def make_trace_fn(params):
            def trace_fn(rays, key):
                return render(params, trainer.occ_state, rays.origins,
                              rays.dirs, jnp.float32(d.dist_min),
                              jnp.float32(d.dist_max), key)
            return trace_fn

        return cls(trainer, make_trace_fn, camera, port, layers)

    def run(self, num_iterations: Optional[int] = None, log_fn=None):
        """Serve the viewer and train to completion (the reference's
        ``WispApp.run`` + background ``trainer.iterate``)."""
        self.server.start_background()

        def work():
            def capture(entry):
                self._last_entry = dict(entry)
                if log_fn:
                    log_fn(entry)

            try:
                self.trainer.train(num_iterations=num_iterations,
                                   log_fn=capture)
            except Exception as e:          # surface on join
                self._train_err = e

        t = threading.Thread(target=work, daemon=True)
        t.start()
        try:
            t.join()
        finally:
            self.server.shutdown()
        if self._train_err is not None:
            raise self._train_err
        return self.trainer
