"""Multi-group optimizer with per-group learning rates.

The reference builds a torch optimizer with 5 named param groups —
decoder / grid / latent_dec / prob_models / rest — each with its own lr and
weight decay (``wisp/trainers/base_trainer.py:206-266``), and the image
trainer *rescales the grid lr every step* from the decoder scale norm
(``image_trainer.py:326-347``).

A TPU-native design wants all of that inside one jitted step, so this module
implements a small functional Adam/AdamW where:
  * each leaf is statically labeled with its group (by pytree path),
  * per-group lr is a *traced* scalar passed at every update (so dynamic lr
    scaling, warmups and schedules need no recompilation),
  * weight-decay semantics match torch: ``adam`` adds ``wd * p`` to the
    gradient (L2), ``adamw`` decays the parameter directly.

Update math matches ``torch.optim.Adam`` exactly (bias-corrected moments).
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: dict
    nu: dict
    count: jax.Array


def label_params(params, label_fn: Callable[[tuple], str]):
    """Build a pytree of string group labels from path tuples.

    ``label_fn`` receives a tuple of dict keys / list indices as strings.
    """
    paths_labels = jax.tree_util.tree_map_with_path(
        lambda path, _: label_fn(tuple(_key_str(k) for k in path)), params)
    return paths_labels


def _key_str(k):
    if hasattr(k, 'key'):
        return str(k.key)
    if hasattr(k, 'idx'):
        return str(k.idx)
    return str(k)


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, params, labels,
                lr: Dict[str, jax.Array], weight_decay: Dict[str, float],
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                decoupled: bool = False):
    """One Adam step.

    Args:
        grads/params/labels: matching pytrees; ``labels`` holds group names.
        lr: group name -> learning rate (traced scalars ok). Groups labeled
            'frozen' (or missing from ``lr``) are left untouched.
        weight_decay: group name -> wd coefficient (static floats).
        decoupled: False = torch adam (L2 added to grad); True = adamw.
    Returns:
        (new_params, new_state)
    """
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def leaf_update(g, p, m, v, lbl):
        if lbl == 'frozen' or lbl not in lr:
            return p, m, v
        glr = lr[lbl]
        wd = weight_decay.get(lbl, 0.0)
        if wd and not decoupled:
            g = g + wd * p
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * jnp.square(g)
        mhat = m / c1
        vhat = v / c2
        step = glr * mhat / (jnp.sqrt(vhat) + eps)
        if wd and decoupled:
            step = step + glr * wd * p
        return p - step, m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_l = treedef.flatten_up_to(labels)
    new_p, new_m, new_v = [], [], []
    for g, p, m, v, lbl in zip(flat_g, flat_p, flat_m, flat_v, flat_l):
        np_, nm, nv = leaf_update(g, p, m, v, lbl)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)
    return (treedef.unflatten(new_p),
            AdamState(mu=treedef.unflatten(new_m), nu=treedef.unflatten(new_v),
                      count=count))


def shacira_label_fn(path: tuple) -> str:
    """Group labels for the SHACIRA pipeline param tree.

    Mirrors the reference's name-based grouping (base_trainer.py:219-239):
    'decoder*' -> decoder, grid codebook -> grid, grid latent decoder ->
    latent_dec (its ``div`` and fixed ``dft`` stay frozen), prob model ->
    prob_models, everything else -> rest.
    """
    joined = '/'.join(path)
    if 'latent_dec' in joined:
        if path[-1] in ('div', 'dft'):
            return 'frozen'
        return 'latent_dec'
    if 'prob_model' in joined:
        return 'prob_models'
    if 'decoder' in joined:
        return 'decoder'
    if 'grid' in joined:
        return 'grid'
    return 'rest'
