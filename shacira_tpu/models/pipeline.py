"""Pipeline — neural field + tracer pairing, and decode-once inference.

Equivalent of ``wisp/models/pipeline.py:14-53`` (reference): a pipeline
couples a neural field with an optional forward map (tracer).  Also hosts the
compressed-inference path: the reference's valid-only mode decodes the latent
codebook ONCE and swaps in a DecoderIdentity for fast repeated queries
(``app/image/main_image.py:591-600``, ``app/nerf/main_nerf.py:665-673``); here
:func:`decode_once` returns the decoded feature table to pass via the
``decoded=`` argument of the field functions.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax

from shacira_tpu.models.grids import latent_grid as lg


@dataclass
class Pipeline:
    """nef apply + optional tracer (ref Pipeline.forward: tracer(nef, *args)
    if tracer else nef(*args))."""
    nef_fn: Callable
    tracer_fn: Optional[Callable] = None

    def __call__(self, params, *args, **kwargs):
        if self.tracer_fn is not None:
            return self.tracer_fn(params, *args, **kwargs)
        return self.nef_fn(params, *args, **kwargs)


def decode_once(params, grid_cfg: lg.LatentGridConfig):
    """Decode the latent codebook once for inference (rounded latents).

    Returns the decoded feature table; pass it as ``decoded=`` to
    ``neural_image_rgb`` / ``nerf_rgba`` / ``neural_sdf`` so repeated queries
    skip quantize+decode — the TPU equivalent of the reference's
    DecoderIdentity swap."""
    return jax.jit(lambda p: lg.decode_codebook(p, grid_cfg))(params['grid'])
