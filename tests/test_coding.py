"""Arithmetic codec: roundtrip exactness + near-entropy code length."""
import numpy as np
import pytest

from shacira_tpu.ops.coding import (
    ArithmeticCoder, coded_size_bits, entropy_bits_histogram,
)


@pytest.mark.parametrize('seed,n,alphabet', [(0, 500, 4), (1, 2000, 17), (2, 100, 2)])
def test_roundtrip(seed, n, alphabet):
    rng = np.random.RandomState(seed)
    probs = rng.dirichlet(np.ones(alphabet))
    syms = rng.choice(alphabet, size=n, p=probs)
    hist = np.bincount(syms, minlength=alphabet).astype(np.float64)
    hist = np.maximum(hist, 1e-9)
    stream = ArithmeticCoder.encode(syms, hist / hist.sum())
    dec = ArithmeticCoder.decode(stream, hist / hist.sum(), n)
    np.testing.assert_array_equal(dec, syms)


def test_code_length_near_entropy():
    rng = np.random.RandomState(0)
    syms = rng.choice(8, size=5000, p=np.asarray([.5, .2, .1, .05, .05, .04, .03, .03]))
    bits = coded_size_bits(syms)
    h = entropy_bits_histogram(syms)
    assert bits >= h * 0.99
    assert bits <= h * 1.05 + 64  # within 5% + constant of entropy


def test_single_symbol_alphabet():
    syms = np.zeros(100, dtype=np.int64)
    bits = coded_size_bits(syms)
    assert bits < 16 * 8  # near-zero cost stream


def test_gaussian_latents_sizes():
    """Rounded gaussian latents (the actual SHACIRA payload shape)."""
    rng = np.random.RandomState(0)
    w = np.round(rng.randn(4096) * 3).astype(np.int64)
    bits = coded_size_bits(w)
    h = entropy_bits_histogram(w)
    assert abs(bits - h) / h < 0.05
