"""Unit tests for the local oracle-gate emulation (tests/oracle_harness.py).

The driver's hasher renders values, so an int64 15 vs float64 15.0 column
hash-differs even when element-wise equality passes — the round-3 blind spot
that let the un-cast DuckDB HUGEINT sums (source_stats, events_sessionized)
slip through the local gate.  compare() must be dtype-strict.
"""

import pandas as pd

from oracle_harness import compare


def test_equal_frames_pass():
    a = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1, 2], dtype="int64")})
    assert compare("t", a, b) == []


def test_int_vs_float_dtype_fails_even_when_values_equal():
    a = pd.DataFrame({"n": pd.array([15, 7], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([15.0, 7.0], dtype="float64")})
    problems = compare("t", a, b)
    assert problems, "int64 vs float64 with equal values must FAIL"
    assert any("dtype" in p for p in problems)


def test_int32_vs_int64_passes():
    # width-only differences render identically ("15" either way) and are
    # driver-green (ann_* rank int32 vs the oracle's int64), so the gate
    # must not flag them
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert compare("t", a, b) == []


def test_float_vs_object_dtype_fails():
    a = pd.DataFrame({"n": pd.array([1.0], dtype="float64")})
    b = pd.DataFrame({"n": pd.array(["1.0"], dtype=object)})
    problems = compare("t", a, b)
    assert any("dtype" in p for p in problems)


def test_value_mismatch_still_fails():
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([1, 3], dtype="int64")})
    problems = compare("t", a, b)
    assert any("value" in p for p in problems)


def test_row_count_mismatch_fails():
    a = pd.DataFrame({"n": pd.array([1], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    problems = compare("t", a, b)
    assert any("rows" in p for p in problems)
