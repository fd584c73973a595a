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


def test_native_coder_matches_python_bitstream():
    from shacira_tpu.csrc import load_range_coder
    lib = load_range_coder()
    if lib is None:
        import pytest
        pytest.skip('no native toolchain')
    rng = np.random.RandomState(0)
    probs = rng.dirichlet(np.ones(9))
    syms = rng.choice(9, size=3000, p=probs)
    hist = np.bincount(syms, minlength=9).astype(np.float64)
    probs_h = hist / hist.sum()
    native = ArithmeticCoder.encode(syms, probs_h)
    py = ArithmeticCoder._encode_py(syms, probs_h)
    assert native == py, 'native and python bitstreams must be identical'
    # cross-decode both ways
    np.testing.assert_array_equal(ArithmeticCoder._decode_py(native, probs_h, len(syms)), syms)
    np.testing.assert_array_equal(ArithmeticCoder.decode(py, probs_h, len(syms)), syms)


def test_native_coder_speed_on_large_stream():
    from shacira_tpu.csrc import load_range_coder
    if load_range_coder() is None:
        import pytest
        pytest.skip('no native toolchain')
    import time
    rng = np.random.RandomState(1)
    syms = np.round(rng.randn(1_000_000) * 4).astype(np.int64)
    syms -= syms.min()
    t0 = time.time()
    bits = coded_size_bits(syms)
    dt = time.time() - t0
    assert bits > 0
    assert dt < 5.0, f'native coding too slow: {dt:.1f}s for 1M symbols'
