import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_spark.operators.codec import (
    BLOCK_SIZE,
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    vbyte_decode,
    vbyte_encode,
)


def test_vbyte_roundtrip_random():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**40, 50_000).astype(np.uint64)
    buf, lens = vbyte_encode(vals)
    assert lens.sum() == len(buf)
    assert np.array_equal(vbyte_decode(buf), vals)


def test_vbyte_edge_values():
    edge = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**49 - 1, 2**49, 2**63, 2**64 - 1], dtype=np.uint64)
    buf, lens = vbyte_encode(edge)
    assert np.array_equal(vbyte_decode(buf), edge)
    assert lens[0] == 1 and lens[2] == 1 and lens[3] == 2


def test_vbyte_empty():
    buf, lens = vbyte_encode(np.array([], dtype=np.uint64))
    assert buf == b"" and len(vbyte_decode(b"")) == 0


@settings(max_examples=50)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=300))
def test_vbyte_roundtrip_hypothesis(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf, _ = vbyte_encode(arr)
    assert np.array_equal(vbyte_decode(buf), arr)


def test_delta_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(2**45, 1000, replace=False)).astype(np.int64)
    base = int(ids[0])
    gaps = delta_encode(ids, base)
    assert np.array_equal(delta_decode(gaps, base), ids)


def test_block_roundtrip():
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(10**9, BLOCK_SIZE, replace=False)).astype(np.int64) + (5 << 40)
    tfs = rng.integers(1, 1000, BLOCK_SIZE).astype(np.int64)
    ib, tb = encode_block(ids, tfs, int(ids[0]))
    ids2, tfs2 = decode_block(ib, tb, int(ids[0]))
    assert np.array_equal(ids2, ids)
    assert np.array_equal(tfs2, tfs)


def test_compression_is_compact():
    # dense small gaps should approach ~1 byte per docID delta
    ids = np.arange(1000, dtype=np.int64) * 3
    gaps = delta_encode(ids, 0)
    buf, _ = vbyte_encode(gaps)
    assert len(buf) == 1000


def test_positions_roundtrip():
    import numpy as np

    from elasticsearch_spark.operators.postings import decode_positions, encode_positions

    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 6, size=50)
    # per-posting ascending positions
    flat = np.concatenate([np.sort(rng.choice(500, size=t, replace=False)) for t in tfs]).astype(np.int64)
    stream, lens = encode_positions(flat, tfs)
    got, occ_off = decode_positions(stream, tfs)
    np.testing.assert_array_equal(got, flat)
    assert occ_off[-1] == tfs.sum()
