"""Lattice encode: exact equivalence with the gather-based hash encode on the
pixel lattice, values and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shacira_tpu.ops.hashgrid import HashGridSpec, hash_encode, geometric_resolutions
from shacira_tpu.ops.lattice import build_image_lattice, lattice_encode, _xor_butterfly
from shacira_tpu.datasets.image import pixel_coords


def test_xor_butterfly_is_xor_permutation():
    bs = 16
    rng = np.random.RandomState(0)
    cols = rng.randn(5, bs, 2).astype(np.float32)
    xorc = np.asarray([0, 3, 7, 10, 15], np.int32)
    out = np.asarray(_xor_butterfly(jnp.asarray(cols), jnp.asarray(xorc), bs))
    for j, c in enumerate(xorc):
        for u in range(bs):
            np.testing.assert_allclose(out[j, u], cols[j, u ^ c], err_msg=f'{j},{u}')


@pytest.mark.parametrize('h,w,bw,res_list', [
    (12, 16, 6, (3, 5, 9, 14)),                       # direct + hashed mix
    (20, 24, 5, (4, 8, 16, 40)),                      # hashed with res > block
    (16, 16, 11, geometric_resolutions(16, 512, 8)),  # kodak-like
])
@pytest.mark.slow
def test_lattice_matches_hash_encode(h, w, bw, res_list):
    spec = HashGridSpec(tuple(int(r) for r in res_list), bw, 2)
    rng = np.random.RandomState(0)
    cb = jnp.asarray(rng.randn(spec.total_size, 2).astype(np.float32))
    meta, arrays = build_image_lattice(h, w, spec)

    coords = jnp.asarray(pixel_coords(h, w))
    want = hash_encode(coords, cb, spec)
    got = lattice_encode(arrays, cb, meta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_lattice_gradients_match():
    spec = HashGridSpec((4, 9, 23), 5, 2)
    h, w = 10, 14
    rng = np.random.RandomState(1)
    cb = jnp.asarray(rng.randn(spec.total_size, 2).astype(np.float32))
    meta, arrays = build_image_lattice(h, w, spec)
    coords = jnp.asarray(pixel_coords(h, w))
    tgt = jnp.asarray(rng.randn(h * w, spec.num_lods, 2).astype(np.float32))

    g1 = jax.grad(lambda c: jnp.sum((lattice_encode(arrays, c, meta) - tgt) ** 2))(cb)
    g2 = jax.grad(lambda c: jnp.sum((hash_encode(coords, c, spec) - tgt) ** 2))(cb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)
