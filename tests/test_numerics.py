"""Unit tests for the shared half-away-from-zero rounding rule.

numpy/pandas round half-to-even; Spark ``F.round`` and DuckDB ``round`` are
half-away-from-zero.  ``round_half_away`` is the single helper every
numpy/pandas site in a gated twin path uses, so an exact half-way tie rounds
identically on all three stacks.  Ties are only testable at decimal places
where the half-way value is exactly representable in binary (0.5, 0.25,
0.0625, ...), so the tie cases below use decimals 0 and 1.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from search_engine_spark.numerics import round_half_away


def test_ties_round_away_from_zero_not_to_even():
    # np.round would give 0.0, 2.0, 0.2, -2.0 for these (half-to-even)
    assert round_half_away(0.5, 0) == 1.0
    assert round_half_away(2.5, 0) == 3.0
    assert round_half_away(0.25, 1) == 0.3
    assert round_half_away(-2.5, 0) == -3.0
    assert round_half_away(-0.25, 1) == -0.3


def test_matches_duckdb_round_on_ties_and_non_ties():
    vals = [0.5, 2.5, -2.5, 0.25, -0.25, 1.2345, -9.8765, 0.0, 100.0625]
    for dec in (0, 1):
        got = round_half_away(np.array(vals), dec)
        want = [
            duckdb.sql(f"SELECT round({v!r}::DOUBLE, {dec})").fetchone()[0]
            for v in vals
        ]
        assert got.tolist() == want, f"decimals={dec}"


def test_non_tie_values_match_np_round():
    rng = np.random.RandomState(7)
    # values away from any 5e-7 boundary: both modes must agree
    x = rng.uniform(-100, 100, 1000)
    x = x[np.abs(np.abs(x * 1e6) % 1 - 0.5) > 1e-3]
    np.testing.assert_array_equal(round_half_away(x, 6), np.round(x, 6))


def test_accepts_scalars_series_and_arrays():
    assert float(round_half_away(1.23456789)) == 1.234568
    s = pd.Series([0.5, -0.5, 1.5])
    out = round_half_away(s, 0)
    assert isinstance(out, np.ndarray)
    assert out.tolist() == [1.0, -1.0, 2.0]
