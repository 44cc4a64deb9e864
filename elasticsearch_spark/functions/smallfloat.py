"""Lucene SmallFloat 1-byte doc-length norm encoding.

BM25 score-identity with the reference requires reproducing Lucene's lossy
norm: document length is encoded to one byte at index time with
``SmallFloat.intToByte4`` and decoded with ``byte4ToInt`` before use
(pinned by the ES call sites in
``server/src/main/java/org/elasticsearch/lucene/similarity/LegacyBM25Similarity.java:27-45``;
algorithm is public Lucene knowledge). The decode∘encode round trip keeps
the top 4 significant bits of the length: values < 8 are exact, larger
values snap down to a 3-bit mantissa + exponent grid.

numpy-vectorized: operates on whole arrays, no per-row Python.
"""

from __future__ import annotations

import numpy as np

# Precomputed decode table: byte value (0..255) -> decoded length.
_DECODE = np.zeros(256, dtype=np.int64)
for _b in range(256):
    bits = _b & 0x07
    shift = (_b >> 3) - 1
    _DECODE[_b] = bits if shift == -1 else (bits | 0x08) << shift


def int_to_byte4(i: np.ndarray | int) -> np.ndarray:
    """Encode non-negative int lengths to the 1-byte SmallFloat grid."""
    arr = np.asarray(i, dtype=np.int64)
    if np.any(arr < 0):
        raise ValueError("lengths must be non-negative")
    small = arr < 8
    # number of significant bits; avoid log2(0)
    safe = np.maximum(arr, 1)
    num_bits = np.floor(np.log2(safe)).astype(np.int64) + 1
    shift = num_bits - 4
    encoded = (arr >> np.maximum(shift, 0)) & 0x07
    encoded = encoded | ((shift + 1) << 3)
    return np.where(small, arr, encoded).astype(np.uint8)


def byte4_to_int(b: np.ndarray | int) -> np.ndarray:
    """Decode the 1-byte norm back to a (quantized) length."""
    arr = np.asarray(b, dtype=np.int64)
    return _DECODE[arr]


def quantize_length(length: np.ndarray | int) -> np.ndarray:
    """decode(encode(length)) — the doc length BM25 actually sees."""
    return byte4_to_int(int_to_byte4(length))
