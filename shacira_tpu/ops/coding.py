"""Entropy coding for compressed-size measurement.

The reference measures the final compressed size by actually arithmetic-coding
the rounded latents with torchac (`wisp/models/grids/latent_grid.py:154-172`).
Here we provide:

* :func:`entropy_bits_histogram` — the per-epoch estimate
  ``sum(counts * clamp(-log2(p + 1e-10), 0, 1000))`` (latent_grid.py:150-153).
* :class:`ArithmeticCoder` — a real static-CDF arithmetic codec (encoder +
  decoder) producing an actual bit stream, used for the final BPP number the
  way the reference uses torchac.  Host-side (numpy); this is an offline
  accounting path, not a train-step op.
"""
from __future__ import annotations

import numpy as np

_PRECISION = 16   # CDF quantization bits (torchac also uses 16-bit CDFs)
_STATE_BITS = 32
_FULL = (1 << _STATE_BITS) - 1
_HALF = 1 << (_STATE_BITS - 1)
_QUARTER = 1 << (_STATE_BITS - 2)


def entropy_bits_histogram(values: np.ndarray) -> float:
    """Histogram self-entropy bits of integer symbols (latent_grid.py:143-153)."""
    values = np.asarray(values).reshape(-1)
    _, counts = np.unique(values, return_counts=True)
    probs = counts / counts.sum()
    info = np.clip(-np.log(probs + 1e-10) / np.log(2.0), 0, 1000)
    return float(np.sum(info * counts))


def _quantize_cdf(probs: np.ndarray) -> np.ndarray:
    """Strictly-increasing integer CDF with ``_PRECISION``-bit total."""
    probs = np.asarray(probs, np.float64)
    probs = probs / probs.sum()
    n = len(probs)
    scale = (1 << _PRECISION) - n
    freq = np.maximum(1, np.round(probs * scale).astype(np.int64))
    cdf = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(freq, out=cdf[1:])
    total = int(cdf[-1])
    # rescale to <= 2^PRECISION, keep every symbol slot non-empty
    cdf = cdf * scale // total + np.arange(n + 1)
    return cdf


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, bit: int):
        self.acc = (self.acc << 1) | bit
        self.nbits += 1
        if self.nbits == 8:
            self.bytes.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def finish(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc << (8 - self.nbits))
        return bytes(self.bytes)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self) -> int:
        byte_i, bit_i = divmod(self.pos, 8)
        self.pos += 1
        if byte_i >= len(self.data):
            return 0
        return (self.data[byte_i] >> (7 - bit_i)) & 1


def _native_lib():
    from shacira_tpu.csrc import load_range_coder
    return load_range_coder()


class ArithmeticCoder:
    """Static-model arithmetic coder (Witten-Neal-Cleary, 32-bit state).

    Uses the native C++ implementation (shacira_tpu/csrc/range_coder.cpp,
    identical bitstream) when the toolchain is available; pure-Python
    otherwise.
    """

    @staticmethod
    def encode(symbols: np.ndarray, probs: np.ndarray) -> bytes:
        lib = _native_lib()
        if lib is not None:
            import ctypes
            syms = np.ascontiguousarray(symbols, np.int32)
            p = np.ascontiguousarray(probs, np.float64)
            cap = len(syms) * 4 + 64
            out = np.zeros(cap, np.uint8)
            n = lib.rc_encode(
                syms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(syms),
                p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
            if n >= 0:
                return bytes(out[:n])
        return ArithmeticCoder._encode_py(symbols, probs)

    @staticmethod
    def _encode_py(symbols: np.ndarray, probs: np.ndarray) -> bytes:
        cdf = _quantize_cdf(probs)
        total = int(cdf[-1])
        low, high, pending = 0, _FULL, 0
        w = _BitWriter()

        def emit(bit, pending):
            w.write(bit)
            for _ in range(pending):
                w.write(1 - bit)
            return 0

        for s in np.asarray(symbols, np.int64):
            s = int(s)
            span = high - low + 1
            high = low + span * int(cdf[s + 1]) // total - 1
            low = low + span * int(cdf[s]) // total
            while True:
                if high < _HALF:
                    pending = emit(0, pending)
                elif low >= _HALF:
                    pending = emit(1, pending)
                    low -= _HALF
                    high -= _HALF
                elif low >= _QUARTER and high < 3 * _QUARTER:
                    pending += 1
                    low -= _QUARTER
                    high -= _QUARTER
                else:
                    break
                low <<= 1
                high = (high << 1) | 1
        pending += 1
        if low < _QUARTER:
            emit(0, pending)
        else:
            emit(1, pending)
        return w.finish()

    @staticmethod
    def decode(data: bytes, probs: np.ndarray, num_symbols: int) -> np.ndarray:
        lib = _native_lib()
        if lib is not None:
            import ctypes
            p = np.ascontiguousarray(probs, np.float64)
            buf = np.frombuffer(data, np.uint8)
            out = np.zeros(num_symbols, np.int32)
            rc = lib.rc_decode(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
                num_symbols,
                p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if rc == 0:
                return out.astype(np.int64)
        return ArithmeticCoder._decode_py(data, probs, num_symbols)

    @staticmethod
    def _decode_py(data: bytes, probs: np.ndarray, num_symbols: int) -> np.ndarray:
        cdf = _quantize_cdf(probs)
        total = int(cdf[-1])
        r = _BitReader(data)
        code = 0
        for _ in range(_STATE_BITS):
            code = (code << 1) | r.read()
        low, high = 0, _FULL
        out = np.zeros(num_symbols, dtype=np.int64)
        for i in range(num_symbols):
            span = high - low + 1
            val = ((code - low + 1) * total - 1) // span
            s = int(np.searchsorted(cdf, val, side='right')) - 1
            s = min(max(s, 0), len(probs) - 1)
            out[i] = s
            high = low + span * int(cdf[s + 1]) // total - 1
            low = low + span * int(cdf[s]) // total
            while True:
                if high < _HALF:
                    pass
                elif low >= _HALF:
                    low -= _HALF
                    high -= _HALF
                    code -= _HALF
                elif low >= _QUARTER and high < 3 * _QUARTER:
                    low -= _QUARTER
                    high -= _QUARTER
                    code -= _QUARTER
                else:
                    break
                low <<= 1
                high = (high << 1) | 1
                code = (code << 1) | r.read()
        return out


def coded_size_bits(values: np.ndarray, probs: np.ndarray = None) -> int:
    """Bits of a real arithmetic codestream of integer symbols.

    Mirrors the torchac path of LatentGrid.size (latent_grid.py:154-172):
    symbols are shifted to a dense 0-based alphabet and coded — with their
    empirical histogram CDF by default, or with caller-supplied per-alphabet
    ``probs`` (e.g. a BitEstimator model CDF; the reference *builds* that CDF
    when ``use_prob_model`` but then overwrites it with the histogram CDF at
    latent_grid.py:165-167 — passing probs here implements the documented
    intent).
    """
    values = np.asarray(values).reshape(-1).astype(np.int64)
    uniq, inv = np.unique(values, return_inverse=True)
    if probs is None:
        counts = np.bincount(inv)
        probs = counts / counts.sum()
    else:
        probs = np.asarray(probs, np.float64)
        assert probs.shape[0] == uniq.shape[0], (probs.shape, uniq.shape)
        probs = np.maximum(probs, 1e-10)
        probs = probs / probs.sum()
    stream = ArithmeticCoder.encode(inv, probs)
    return len(stream) * 8
