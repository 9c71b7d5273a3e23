"""Key-hash canonicalization tests — the reference's equality contract
(/root/reference/src/hash_keys.cpp:57-68, tests/testthat/test-hash_keys32.R,
test-cross-type-keys.R): keys the join would consider equal must hash
identically across storage types; nulls collapse to one sentinel per tag."""

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.functions.keys import hash_keys32, hash_keys64


def t(**cols):
    return pa.table(cols)


def test_deterministic_and_distinct():
    a = t(k=pa.array([1, 2, 3, 2**40], type=pa.int64()))
    h1 = hash_keys32(a, ["k"])
    h2 = hash_keys32(a, ["k"])
    assert h1.dtype == np.int32
    np.testing.assert_array_equal(h1, h2)
    assert len(np.unique(h1)) == 4


def test_int_double_bool_unify():
    ints = t(k=pa.array([0, 1, 2, 7], type=pa.int32()))
    longs = t(k=pa.array([0, 1, 2, 7], type=pa.int64()))
    dbls = t(k=pa.array([0.0, 1.0, 2.0, 7.0], type=pa.float64()))
    flts = t(k=pa.array([0.0, 1.0, 2.0, 7.0], type=pa.float32()))
    np.testing.assert_array_equal(hash_keys32(ints, ["k"]), hash_keys32(dbls, ["k"]))
    np.testing.assert_array_equal(hash_keys32(longs, ["k"]), hash_keys32(dbls, ["k"]))
    np.testing.assert_array_equal(hash_keys32(flts, ["k"]), hash_keys32(dbls, ["k"]))
    bools = t(k=pa.array([False, True], type=pa.bool_()))
    zero_one = t(k=pa.array([0.0, 1.0]))
    np.testing.assert_array_equal(hash_keys32(bools, ["k"]), hash_keys32(zero_one, ["k"]))


def test_negative_zero_and_nan():
    a = t(k=pa.array([-0.0, 0.0]))
    h = hash_keys32(a, ["k"])
    assert h[0] == h[1]
    nans = t(k=pa.array([float("nan"), None], type=pa.float64()))
    hn = hash_keys32(nans, ["k"])
    assert hn[0] == hn[1]  # NaN ≡ null (reference NA ≡ NaN rule)


def test_null_sentinels_per_tag():
    int_null = hash_keys32(t(k=pa.array([None], type=pa.int64())), ["k"])
    dbl_null = hash_keys32(t(k=pa.array([None], type=pa.float64())), ["k"])
    str_null = hash_keys32(t(k=pa.array([None], type=pa.string())), ["k"])
    assert int_null[0] == dbl_null[0]
    assert int_null[0] != str_null[0]  # numeric-null vs string-null differ


def test_dictionary_equals_plain_string():
    vals = ["apple", "banana", "apple", None, "chérie", "日本語"]
    plain = t(k=pa.array(vals, type=pa.string()))
    large = t(k=pa.array(vals, type=pa.large_string()))
    dict_arr = t(k=pa.array(vals).dictionary_encode())
    np.testing.assert_array_equal(hash_keys32(plain, ["k"]), hash_keys32(dict_arr, ["k"]))
    np.testing.assert_array_equal(hash_keys32(plain, ["k"]), hash_keys32(large, ["k"]))


def test_date_equals_timestamp_at_instant():
    days = [0, 1, 400, 20000]
    dates = t(k=pa.array(days, type=pa.date32()))
    ts_us = t(k=pa.array([d * 86_400_000_000 for d in days], type=pa.timestamp("us")))
    ts_s = t(k=pa.array([d * 86_400 for d in days], type=pa.timestamp("s")))
    np.testing.assert_array_equal(hash_keys32(dates, ["k"]), hash_keys32(ts_us, ["k"]))
    np.testing.assert_array_equal(hash_keys32(dates, ["k"]), hash_keys32(ts_s, ["k"]))


def test_composite_order_matters():
    a = t(x=pa.array([1, 2]), y=pa.array(["a", "b"]))
    h_xy = hash_keys32(a, ["x", "y"])
    h_yx = hash_keys32(a, ["y", "x"])
    assert not np.array_equal(h_xy, h_yx)


def test_string_collision_bait():
    bait = ["a", "aa", "aaa", "ab", "ba", "b" * 100, "", " ", "test@email.com",
            "unicode-ñäöü", "file/path.txt", "123-456-7890"]
    h = hash_keys32(t(k=pa.array(bait)), ["k"])
    assert len(np.unique(h)) == len(bait)


def test_hash64_more_entropy():
    n = 200_000
    a = t(k=pa.array(np.arange(n), type=pa.int64()))
    h64 = hash_keys64(a, ["k"])
    assert h64.dtype == np.uint64
    assert len(np.unique(h64)) == n


def test_errors():
    a = t(k=pa.array([1, 2]))
    with pytest.raises(KeyError):
        hash_keys32(a, ["missing"])
    with pytest.raises(ValueError):
        hash_keys32(a, [])


def test_sliced_and_chunked_arrays():
    vals = ["aa", "bb", "cc", "dd", "ee", "ff"]
    full = pa.table({"k": pa.array(vals)})
    h_full = hash_keys32(full, ["k"])
    sliced = full.slice(2, 3)
    np.testing.assert_array_equal(hash_keys32(sliced, ["k"]), h_full[2:5])
    chunked = pa.table({"k": pa.chunked_array([vals[:3], vals[3:]])})
    np.testing.assert_array_equal(hash_keys32(chunked, ["k"]), h_full)
