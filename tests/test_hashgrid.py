"""Hash-grid encoding: equivalence with an independent NumPy oracle that
follows the reference CUDA semantics (hashgrid_interpolate_cuda.cu), plus
gradient checks for the custom VJP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shacira_tpu.ops.hashgrid import (
    HashGridSpec, hash_encode, hash_encode_naive, geometric_resolutions,
    use_direct_index, PRIMES,
)


def numpy_oracle(coords, codebook, spec: HashGridSpec):
    """Straight NumPy transcription of the reference kernel's math."""
    N = coords.shape[0]
    F = codebook.shape[1]
    dim = spec.dim
    out = np.zeros((N, spec.num_lods, F), np.float32)
    for lod, res in enumerate(spec.resolutions):
        table = codebook[spec.lod_first_idx[lod]: spec.lod_first_idx[lod] + spec.lod_sizes[lod]]
        for i in range(N):
            x = np.clip(res * (coords[i] * 0.5 + 0.5), 0, res - 1 - 1e-5)
            pos = np.floor(x).astype(np.int64)
            frac = x - pos
            acc = np.zeros(F, np.float32)
            for j in range(2 ** dim):
                corner = pos.copy()
                w = 1.0
                for d in range(dim):
                    bit = (j >> (dim - 1 - d)) & 1
                    corner[d] += bit
                    w *= frac[d] if bit else (1 - frac[d])
                if use_direct_index(res, spec.codebook_size, dim):
                    idx = 0
                    for d in range(dim):
                        idx += corner[d] * res ** d
                else:
                    h = np.uint32(0)
                    for d in range(dim):
                        h ^= np.uint32((int(corner[d]) * PRIMES[d]) & 0xFFFFFFFF)
                    idx = int(h) % spec.codebook_size
                acc += table[idx] * w
            out[i, lod] = acc
    return out


@pytest.mark.parametrize('dim,bw,res_list', [
    (2, 4, (3, 7, 16, 33)),       # mixes direct-index and hashed LODs
    (3, 5, (2, 4, 9, 17)),
    (2, 11, geometric_resolutions(16, 512, 6)),
])
def test_forward_matches_oracle(dim, bw, res_list):
    spec = HashGridSpec(tuple(res_list), bw, dim)
    rng = np.random.RandomState(0)
    coords = rng.uniform(-1, 1, (64, dim)).astype(np.float32)
    cb = rng.randn(spec.total_size, 2).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(coords), jnp.asarray(cb), spec))
    want = numpy_oracle(coords, cb, spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_boundary_coords():
    """Coords exactly at -1/1 must clamp, not index out of bounds."""
    spec = HashGridSpec((4, 16), 4, 2)
    coords = jnp.asarray([[-1.0, -1.0], [1.0, 1.0], [0.0, 1.0]])
    cb = jnp.ones((spec.total_size, 2))
    out = hash_encode(coords, cb, spec)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_custom_vjp_matches_autodiff():
    spec = HashGridSpec((3, 8, 21), 4, 3)
    rng = np.random.RandomState(1)
    coords = jnp.asarray(rng.uniform(-1, 1, (32, 3)).astype(np.float32))
    cb = jnp.asarray(rng.randn(spec.total_size, 4).astype(np.float32))

    def loss_custom(cb):
        return jnp.sum(jnp.sin(hash_encode(coords, cb, spec)))

    def loss_naive(cb):
        return jnp.sum(jnp.sin(hash_encode_naive(coords, cb, spec)))

    g1 = jax.grad(loss_custom)(cb)
    g2 = jax.grad(loss_naive)(cb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_grad_scatter_accumulates():
    """Two coords hitting the same cell must accumulate gradients (the
    reference uses atomicAdd; ours must sum, deterministically)."""
    spec = HashGridSpec((4,), 8, 2)
    coords = jnp.asarray([[-0.99, -0.99], [-0.99, -0.99]])
    cb = jnp.zeros((spec.total_size, 2))
    g = jax.grad(lambda c: jnp.sum(hash_encode(coords, c, spec)))(cb)
    # each coord maps to x=0.02 -> corner (0,0) weight (1-0.02)^2; two coords sum
    assert np.asarray(g)[0, 0] == pytest.approx(2 * 0.98 ** 2, rel=1e-3)


def test_jit_and_lod_layout():
    spec = HashGridSpec((5, 9), 6, 2)
    coords = jnp.zeros((8, 2))
    cb = jnp.arange(spec.total_size * 3, dtype=jnp.float32).reshape(-1, 3)
    out = jax.jit(lambda c, t: hash_encode(c, t, spec))(coords, cb)
    assert out.shape == (8, 2, 3)


@pytest.mark.slow
def test_static_plan_matches_dynamic():
    """Static-coords plan (precomputed gather + transpose backward) must
    reproduce the dynamic path exactly, fwd and bwd."""
    from shacira_tpu.ops.hashgrid import build_static_plan, static_hash_encode
    spec = HashGridSpec((5, 9, 33), 6, 2)
    rng = np.random.RandomState(3)
    coords = rng.uniform(-1, 1, (200, 2)).astype(np.float32)
    cb = jnp.asarray(rng.randn(spec.total_size, 2).astype(np.float32))
    meta, arrays = build_static_plan(coords, spec)
    arrays = jax.tree.map(jnp.asarray, arrays)

    out_static = static_hash_encode(arrays, cb, meta)
    out_dyn = hash_encode(jnp.asarray(coords), cb, spec)
    np.testing.assert_allclose(np.asarray(out_static), np.asarray(out_dyn),
                               rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda c: jnp.sum(jnp.sin(static_hash_encode(arrays, c, meta))))(cb)
    g2 = jax.grad(lambda c: jnp.sum(jnp.sin(hash_encode(jnp.asarray(coords), c, spec))))(cb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_affine_fused_matches_decode_then_encode():
    """hash_encode_affine(z, S, b) must equal hash_encode(z @ S + b) in both
    values and gradients (z, scale, shift)."""
    spec = HashGridSpec((5, 9, 33), 6, 2)
    rng = np.random.RandomState(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (150, 2)).astype(np.float32))
    z = jnp.asarray(rng.randn(spec.total_size, 2).astype(np.float32))
    scale = jnp.asarray(rng.randn(2, 4).astype(np.float32) * 0.3)
    shift = jnp.asarray(rng.randn(1, 4).astype(np.float32) * 0.1)
    from shacira_tpu.ops.hashgrid import hash_encode_affine

    out_f = hash_encode_affine(coords, z, scale, shift, spec)
    out_r = hash_encode(coords, z @ scale + shift, spec)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-4, atol=1e-5)

    tgt = jnp.asarray(rng.randn(150, 3, 4).astype(np.float32))

    def loss_fused(z, s, b):
        return jnp.sum((hash_encode_affine(coords, z, s, b, spec) - tgt) ** 2)

    def loss_ref(z, s, b):
        return jnp.sum((hash_encode(coords, z @ s + b, spec) - tgt) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(z, scale, shift)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(z, scale, shift)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_no_oob_at_large_direct_resolutions():
    """Regression: for res >~170 the reference's float32 clamp bound
    ``res-1-1e-5`` rounds to res-1, producing out-of-bounds corner indices
    (a silent OOB read in the reference CUDA; NaN fills through jnp.take).
    Our corner clamp must keep every index in range at coords near +1."""
    spec = HashGridSpec(geometric_resolutions(16, 512, 16), 21, 2)
    rng = np.random.RandomState(0)
    coords = np.concatenate([
        rng.uniform(-1, 1, (512, 2)),
        np.full((8, 2), 1.0),            # exactly at the boundary
        np.full((8, 2), 1.0 - 1e-7),
    ]).astype(np.float32)
    cb = jnp.asarray(rng.randn(spec.total_size, 4).astype(np.float32))
    out = hash_encode(jnp.asarray(coords), cb, spec)
    assert not bool(jnp.isnan(out).any())
    # per-LOD indices stay in bounds
    from shacira_tpu.ops.hashgrid import _lod_corner_indices_and_weights
    for lod, res in enumerate(spec.resolutions):
        idx, w = _lod_corner_indices_and_weights(jnp.asarray(coords), res, spec)
        assert int(jnp.max(idx)) < spec.lod_sizes[lod], (lod, res)
        assert float(jnp.min(w)) >= 0.0 and float(jnp.max(w)) <= 1.0


def test_brick_gather_matches_plain_path():
    """Brick-packed dense-LOD gather must be bit-equivalent to the per-corner
    path (it reads the same rows, packed into one wide row per cell)."""
    from shacira_tpu.ops import hashgrid as hg
    spec = HashGridSpec(geometric_resolutions(4, 300, 10), 12, 3)
    assert any(hg.use_direct_index(r, spec.codebook_size, 3)
               for r in spec.resolutions)
    assert not all(hg.use_direct_index(r, spec.codebook_size, 3)
                   for r in spec.resolutions)
    rng = np.random.RandomState(3)
    coords = jnp.asarray(np.concatenate([
        rng.uniform(-1, 1, (257, 3)), np.full((3, 3), 1.0),
        np.full((3, 3), -1.0)]).astype(np.float32))
    cb = jnp.asarray(rng.randn(spec.total_size, 2).astype(np.float32))

    def loss(c):
        return jnp.sum(jnp.sin(hash_encode(coords, c, spec)))

    assert hg.BRICK_GATHER
    out_b = hash_encode(coords, cb, spec)
    g_b = jax.grad(loss)(cb)
    hg.BRICK_GATHER = False
    try:
        out_p = hash_encode(coords, cb, spec)
        g_p = jax.grad(loss)(cb)
    finally:
        hg.BRICK_GATHER = True
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_p))
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_p),
                               rtol=1e-6, atol=1e-6)


def test_brick_gather_affine_matches_plain_path():
    from shacira_tpu.ops import hashgrid as hg
    from shacira_tpu.ops.hashgrid import hash_encode_affine
    spec = HashGridSpec(geometric_resolutions(4, 120, 8), 11, 3)
    rng = np.random.RandomState(4)
    coords = jnp.asarray(rng.uniform(-1, 1, (200, 3)).astype(np.float32))
    z = jnp.asarray(rng.randn(spec.total_size, 2).astype(np.float32))
    scale = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    shift = jnp.asarray(rng.randn(1, 4).astype(np.float32))

    def loss(z_, s_, sh_):
        return jnp.sum(jnp.cos(hash_encode_affine(coords, z_, s_, sh_, spec)))

    out_b = hash_encode_affine(coords, z, scale, shift, spec)
    gz_b, gs_b, gsh_b = jax.grad(loss, argnums=(0, 1, 2))(z, scale, shift)
    hg.BRICK_GATHER = False
    try:
        out_p = hash_encode_affine(coords, z, scale, shift, spec)
        gz_p, gs_p, gsh_p = jax.grad(loss, argnums=(0, 1, 2))(z, scale, shift)
    finally:
        hg.BRICK_GATHER = True
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)
    for a, b in ((gz_b, gz_p), (gs_b, gs_p), (gsh_b, gsh_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
