"""The local gate must be driver-faithful: the driver hashes stringified
cells, so representation divergences that compare equal numerically —
int64 vs integer-valued float64 (DuckDB HUGEINT sums), IEEE -0.0 vs 0.0
(DuckDB round()) — must FAIL, not WARN.  All three round-5 driver hash
failures were in this class and slipped past the old 1e-9-rtol compare.

Pure-pandas tests over tools/selfcheck.compare — no Spark session.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from selfcheck import compare  # noqa: E402


def test_identical_frames_pass():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, -2.25]})
    assert compare("q", a, a.copy()) == []


def test_int64_vs_integer_valued_float64_fails():
    # the q_dataset_fingerprint / q_pack_sequences class: DuckDB HUGEINT
    # sums materialize as float64; values match numerically but the
    # driver hash sees "2434" vs "2434.0"
    got = pd.DataFrame({"n": pd.Series([2434, 7], dtype="int64")})
    want = pd.DataFrame({"n": pd.Series([2434.0, 7.0], dtype="float64")})
    errs = compare("q", got, want)
    assert len(errs) == 1 and "representation" in errs[0]


def test_signed_zero_fails():
    # the q_anomaly class: DuckDB round() emits -0.0, Spark never does
    got = pd.DataFrame({"z": [0.0, 1.25]})
    want = pd.DataFrame({"z": [-0.0, 1.25]})
    errs = compare("q", got, want)
    assert len(errs) == 1 and "representation" in errs[0]
    assert "-0.0" in errs[0]


def test_float_bit_inexact_fails_not_warns():
    # within 1e-9 rtol (the old compare WARNed and passed) but a
    # stringified-cell hash differs
    got = pd.DataFrame({"x": [1.0]})
    want = pd.DataFrame({"x": [1.0 + 1e-13]})
    errs = compare("q", got, want)
    assert len(errs) == 1 and "representation" in errs[0]


def test_genuine_value_mismatch_reported_as_value_bug():
    got = pd.DataFrame({"x": [1.0]})
    want = pd.DataFrame({"x": [2.0]})
    errs = compare("q", got, want)
    assert len(errs) == 1 and "value mismatch" in errs[0]


def test_nan_and_null_still_compare_equal():
    got = pd.DataFrame({"x": [float("nan")], "s": pd.Series([None], dtype=object)})
    want = pd.DataFrame({"x": [float("nan")], "s": pd.Series([None], dtype=object)})
    assert compare("q", got, want) == []


def test_row_order_insensitive():
    got = pd.DataFrame({"k": [2, 1], "v": [2.0, 1.0]})
    want = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    assert compare("q", got, want) == []
