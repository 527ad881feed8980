"""Levenshtein-pct (byte denominator) and Jaro-Winkler (strsim parity)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from name_matcher_spark.functions.similarity import (
    jaro,
    jaro_winkler,
    lev_pct_col,
    levenshtein_py,
)


@pytest.mark.parametrize(
    ("a", "b", "dist"),
    [("kitten", "sitting", 3), ("", "", 0), ("abc", "", 3), ("flaw", "lawn", 2)],
)
def test_levenshtein_py(a, b, dist):
    assert levenshtein_py(a, b) == dist


def test_lev_pct_byte_denominator(spark):
    """'josé' vs 'jose': char distance 1, but max BYTE length is 5
    (é is 2 bytes in UTF-8) -> pct = (1 - 1/5)*100 = 80, not 75."""
    df = spark.createDataFrame([("josé", "jose"), ("", ""), ("ab", "ab")], ["a", "b"])
    got = [r[0] for r in df.select(lev_pct_col(F.col("a"), F.col("b"))).collect()]
    assert got[0] == pytest.approx(80.0)
    assert got[1] == 100.0
    assert got[2] == 100.0


@pytest.mark.parametrize(
    ("a", "b", "expected"),
    [
        # strsim reference values (standard Jaro)
        ("MARTHA", "MARHTA", 17 / 18),
        ("DIXON", "DICKSONX", 0.7666666666666666),
        ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
        ("", "", 1.0),
        ("a", "", 0.0),
        ("abc", "abc", 1.0),
    ],
)
def test_jaro(a, b, expected):
    assert math.isclose(jaro(a, b), expected, rel_tol=1e-12)


def test_jaro_winkler_unconditional_boost():
    """strsim 0.11 applies the prefix boost even when jaro <= 0.7
    (unlike Winkler's original)."""
    a, b = "DIXON", "DICKSONX"
    j = jaro(a, b)
    expected = j + 2 * 0.1 * (1 - j)
    assert math.isclose(jaro_winkler(a, b), expected, rel_tol=1e-12)


def test_jaro_winkler_known():
    assert math.isclose(
        jaro_winkler("MARTHA", "MARHTA"), 17 / 18 + 3 * 0.1 * (1 - 17 / 18),
        rel_tol=1e-12,
    )
    assert jaro_winkler("x", "x") == 1.0


def test_jw_udf_pair_key_unambiguous_with_control_chars():
    """The batch kernel's unique-pair dedup key is length-prefixed:
    pairs ('x\\x1f', 'y') and ('x', '\\x1fy') must score independently,
    not collapse onto one key."""
    import pandas as pd

    from name_matcher_spark.functions.similarity import (
        _jaro_winkler_pct_udf,
        jaro_winkler,
    )

    a = pd.Series(["x\x1f", "x"])
    b = pd.Series(["y", "\x1fy"])
    got = _jaro_winkler_pct_udf.func(a, b)
    assert got.iloc[0] == pytest.approx(jaro_winkler("x\x1f", "y") * 100.0)
    assert got.iloc[1] == pytest.approx(jaro_winkler("x", "\x1fy") * 100.0)
