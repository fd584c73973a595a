"""Checkpoint / resume.

Equivalent of the reference's resume_state / model save logic
(``wisp/trainers/base_trainer.py:399-443``, ``image_trainer.py:566-590``):
state is a pytree of arrays + metadata, saved atomically.  Arrays are stored
as numpy in a single ``.npz``-style pickle (no torch dependency).
"""
from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Dict

import jax
import numpy as np


def save_state(path: str, state: Dict[str, Any]) -> None:
    """Atomically pickle a pytree-of-arrays state dict."""
    host_state = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, 'shape') else x, state)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d or '.', suffix='.tmp')
    try:
        with os.fdopen(fd, 'wb') as f:
            pickle.dump(host_state, f, protocol=4)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        return pickle.load(f)


def save_trainer(trainer, path: str, extra: Dict[str, Any] = None) -> None:
    """Save an Image/Multiview trainer's resumable state
    (ref save_state, image_trainer.py:566-576)."""
    state = {
        'epoch': getattr(trainer, 'epoch', None),
        'iteration': getattr(trainer, 'iteration', None),
        'params': trainer.params,
        'opt_state': trainer.opt_state,
        'noise': trainer.noise,
        'rng': trainer.rng,
    }
    if hasattr(trainer, 'best_params'):
        state['best_params'] = trainer.best_params
        state['best_loss'] = trainer.best_loss
        state['best_psnr'] = trainer.best_psnr
    if getattr(trainer, 'val_best_params', None) is not None:
        state['val_best_params'] = trainer.val_best_params
        state['best_val_psnr'] = trainer.best_val_psnr
    if hasattr(trainer, '_resampled_epoch'):
        state['_resampled_epoch'] = trainer._resampled_epoch
    if hasattr(trainer, 'occ_state'):
        state['occ_state'] = trainer.occ_state
    if extra:
        state.update(extra)
    save_state(path, state)


def save_model(path: str, params, model_format: str = 'full',
               configs: Dict[str, Any] = None) -> None:
    """Save a trained model (ref save_model, base_trainer.py:423-443).

    'full' stores params together with the config dataclasses needed to
    rebuild the pipeline (the analog of pickling the whole torch Pipeline);
    'state_dict' stores params only.
    """
    if model_format == 'full':
        save_state(path, {'format': 'full', 'params': params,
                          'configs': configs or {}})
    elif model_format == 'state_dict':
        save_state(path, {'format': 'state_dict', 'params': params})
    else:
        raise ValueError(model_format)


def load_model(path: str) -> Dict[str, Any]:
    """Load a model saved by :func:`save_model` (params as device arrays)."""
    import jax.numpy as jnp
    state = load_state(path)
    state['params'] = jax.tree.map(jnp.asarray, state['params'])
    return state


def restore_trainer(trainer, path: str) -> Dict[str, Any]:
    """Restore trainer state in place; returns the raw state dict
    (ref resume_state, image_trainer.py:578-590)."""
    import jax.numpy as jnp
    state = load_state(path)
    to_dev = lambda tree: jax.tree.map(jnp.asarray, tree)
    trainer.params = to_dev(state['params'])
    trainer.opt_state = jax.tree.map(jnp.asarray, state['opt_state'])
    trainer.noise = jnp.asarray(state['noise'])
    trainer.rng = jnp.asarray(state['rng'])
    if state.get('epoch') is not None:
        trainer.epoch = state['epoch']
    if state.get('iteration') is not None and hasattr(trainer, 'iteration'):
        trainer.iteration = state['iteration']
    if 'best_params' in state and hasattr(trainer, 'best_params'):
        trainer.best_params = to_dev(state['best_params'])
        trainer.best_loss = jnp.asarray(state['best_loss'])
        trainer.best_psnr = jnp.asarray(state['best_psnr'])
    if 'val_best_params' in state:
        trainer.val_best_params = state['val_best_params']   # host arrays
        trainer.best_val_psnr = state['best_val_psnr']
    if '_resampled_epoch' in state:
        trainer._resampled_epoch = state['_resampled_epoch']
    if 'occ_state' in state and hasattr(trainer, 'occ_state'):
        trainer.occ_state = to_dev(state['occ_state'])
    return state
