"""Group-labeled Adam: parity with torch.optim.Adam per group."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from shacira_tpu import optim


def test_adam_matches_torch():
    rng = np.random.RandomState(0)
    w = rng.randn(4, 3).astype(np.float32)
    params = {'grid': {'codebook': jnp.asarray(w)}}
    labels = optim.label_params(params, optim.shacira_label_fn)
    state = optim.adam_init(params)

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.Adam([tw], lr=0.02, weight_decay=0.01)

    for i in range(5):
        g = rng.randn(4, 3).astype(np.float32)
        grads = {'grid': {'codebook': jnp.asarray(g)}}
        params, state = optim.adam_update(
            grads, state, params, labels,
            lr={'grid': jnp.asarray(0.02)}, weight_decay={'grid': 0.01})
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    np.testing.assert_allclose(np.asarray(params['grid']['codebook']),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_frozen_leaves_untouched():
    params = {'grid': {'latent_dec': {'div': jnp.ones(3), 'layers': [{'scale': jnp.ones((3, 2))}]}}}
    labels = optim.label_params(params, optim.shacira_label_fn)
    assert labels['grid']['latent_dec']['div'] == 'frozen'
    assert labels['grid']['latent_dec']['layers'][0]['scale'] == 'latent_dec'
    state = optim.adam_init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    new_params, _ = optim.adam_update(
        grads, state, params, labels,
        lr={'latent_dec': jnp.asarray(0.1)}, weight_decay={})
    np.testing.assert_allclose(np.asarray(new_params['grid']['latent_dec']['div']), 1.0)
    assert not np.allclose(np.asarray(new_params['grid']['latent_dec']['layers'][0]['scale']), 1.0)


def test_shacira_label_fn_groups():
    assert optim.shacira_label_fn(('decoder_color', 'layers', '0', 'w')) == 'decoder'
    assert optim.shacira_label_fn(('grid', 'codebook')) == 'grid'
    assert optim.shacira_label_fn(('grid', 'prob_model', 'f1', 'h')) == 'prob_models'
    assert optim.shacira_label_fn(('grid', 'latent_dec', 'layers', '0', 'dft')) == 'frozen'
