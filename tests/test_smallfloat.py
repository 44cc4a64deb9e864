import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from elasticsearch_spark.functions.smallfloat import byte4_to_int, int_to_byte4, quantize_length


def test_known_values():
    # hand-computed from the SmallFloat.intToByte4 algorithm: exact < 8,
    # then 3-bit mantissa + exponent
    cases = {0: 0, 1: 1, 7: 7, 8: 8, 15: 15, 16: 16, 17: 16, 100: 96, 255: 240, 1000: 960}
    for v, expected_dec in cases.items():
        assert int(quantize_length(v)) == expected_dec


def test_monotone_and_lossy_floor():
    xs = np.arange(0, 1_000_000, 7)
    dec = byte4_to_int(int_to_byte4(xs))
    assert np.all(dec <= xs)
    assert np.all(np.diff(dec) >= 0)


def test_idempotent():
    xs = np.arange(0, 100_000)
    once = byte4_to_int(int_to_byte4(xs))
    twice = byte4_to_int(int_to_byte4(once))
    assert np.array_equal(once, twice)


def test_exact_below_8():
    for v in range(8):
        assert int(quantize_length(v)) == v


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_roundtrip_keeps_top4_bits(v):
    d = int(quantize_length(v))
    if v < 8:
        assert d == v
    else:
        shift = v.bit_length() - 4
        assert d == (v >> shift) << shift


def test_sql_expr_matches_numpy():
    import duckdb

    from elasticsearch_spark.functions.bm25 import sql_quantized_dl_expr

    xs = np.r_[np.arange(1, 2000), np.array([5000, 65535, 10**6])]
    expr = sql_quantized_dl_expr("dl")
    got = duckdb.sql(
        f"select {expr} as q from (select unnest({xs.tolist()}) as dl)"
    ).fetchnumpy()["q"]
    assert np.array_equal(np.asarray(got, dtype=np.int64), quantize_length(xs))
