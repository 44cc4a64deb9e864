"""Postings compression: delta + variable-byte (VByte), numpy-vectorized.

Plays the role of Lucene's postings formats (delta-encoded docIDs in FOR
blocks + VByte tails; codec selection pinned at
``server/src/main/java/org/elasticsearch/index/codec/CodecService.java:29-43``).
We use VByte for both docID deltas and term frequencies; blocks are ≤128
entries (Lucene's block size), each block carrying its absolute
``first_doc_id`` so blocks are independently decodable (the skip-list
property block-max WAND needs).

Everything here is whole-array numpy — encode/decode of a segment's full
postings happens in a handful of vectorized calls, no per-value Python.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_MAX_VBYTE = 10  # 64-bit worst case


def vbyte_encode(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode uint64 array → (byte stream, per-value byte lengths).

    Layout per value: little-endian base-128 groups, high bit = continuation
    (set on every byte except the last).
    """
    v = np.asarray(vals, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes needed per value: integer threshold compares (no float log2) —
    # nbytes = 1 + #{k : v >= 2^(7k)}
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, _MAX_VBYTE):
        mask = v >= (np.uint64(1) << np.uint64(7 * k))
        if not mask.any():
            break
        nbytes += mask
    width = int(nbytes.max())  # usually 1-3
    if width == 1:
        # all values < 128 (the dominant tf/position-delta case): the
        # stream IS the values — 4× over the general path
        return v.astype(np.uint8).tobytes(), nbytes
    # scatter per byte-position: `width` passes of 1-D ops, no (n × width)
    # temporaries and no giant boolean gather
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    for k in range(width):
        sel = nbytes > k
        idx = starts[sel] + k
        byte = ((v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1) > k
        out[idx] = byte | (cont.astype(np.uint8) << 7)
    return out.tobytes(), nbytes


def vbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a VByte stream → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    cont = b & np.uint8(0x80)
    if not cont.any():
        # no continuation bits anywhere: every value is one byte (the
        # dominant tf/position-delta case) — the stream IS the values.
        # One pass instead of the six the group-reconstruction needs.
        return b.astype(np.uint64)
    # general path, shaped for the real byte-length distribution: most
    # groups are single-byte, so take every group's LAST byte with one
    # gather (correct for 1-byte groups outright) and patch only the
    # multi-byte minority with per-offset shift-accumulate — no
    # full-length repeat/arange/reduceat temporaries.
    idx_last = np.nonzero(cont == 0)[0]
    n_groups = len(idx_last)
    if len(b) - n_groups > (n_groups >> 1):
        # multi-byte groups dominate (>~1/3 continuation bytes): the
        # position/reduceat formulation beats per-group gathers there
        starts = np.empty(n_groups, dtype=np.int64)
        starts[0] = 0
        np.add(idx_last[:-1], 1, out=starts[1:])
        lens = np.diff(np.r_[starts, len(b)])
        pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
        contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
            pos.astype(np.uint64) * np.uint64(7)
        )
        return np.add.reduceat(contrib, starts)
    lens = np.diff(np.r_[np.int64(-1), idx_last])
    vals = (b & np.uint8(0x7F)).astype(np.uint64)
    out = vals[idx_last]
    multi = lens > 1
    if multi.any():
        ml = idx_last[multi]
        mlen = lens[multi]
        acc = np.zeros(len(ml), dtype=np.uint64)
        for k in range(int(mlen.max())):  # k = offset back from the last byte
            sel = mlen > k
            shift = ((mlen[sel] - 1 - k) * 7).astype(np.uint64)
            acc[sel] += vals[ml[sel] - k] << shift
        out[multi] = acc
    return out


def delta_encode(sorted_ids: np.ndarray, base: int) -> np.ndarray:
    """Strictly-increasing int64 ids → gaps (first gap relative to base)."""
    ids = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty(len(ids), dtype=np.uint64)
    if len(ids):
        out[0] = np.uint64(ids[0] - base)
        out[1:] = np.diff(ids).astype(np.uint64)
    return out


def delta_decode(gaps: np.ndarray, base: int) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64).astype(np.int64)
    return base + np.cumsum(g)


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, base: int) -> tuple[bytes, bytes]:
    """One postings block → (encoded docID gaps, encoded tfs)."""
    ids_buf, _ = vbyte_encode(delta_encode(doc_ids, base))
    tf_buf, _ = vbyte_encode(np.asarray(tfs, dtype=np.uint64))
    return ids_buf, tf_buf


def decode_block(ids_buf: bytes, tf_buf: bytes, base: int) -> tuple[np.ndarray, np.ndarray]:
    ids = delta_decode(vbyte_decode(ids_buf), base)
    tfs = vbyte_decode(tf_buf).astype(np.int64)
    return ids, tfs
