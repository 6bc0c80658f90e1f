"""Shared numeric rounding rule for tie-deciding comparisons.

Twin physical paths (driver numpy / distributed Spark / DuckDB oracle) order,
bucket, and log on values rounded to a fixed number of decimals.  The three
stacks default to three different half-way modes: numpy's ``np.round`` and
pandas ``.round`` are half-to-even, Spark's ``F.round`` is BigDecimal
ROUND_HALF_UP (= away from zero for negatives too), and DuckDB's ``round()``
is half-away-from-zero.  A value landing exactly on a 5e-(d+1) boundary would
therefore flip a winner or a bucket between implementations even though every
other digit agrees.

Every numpy/pandas site that feeds a gated comparison or a rank tiebreak uses
:func:`round_half_away`, which implements half-away-from-zero — the rule Spark
and DuckDB already share.  This removes the SYSTEMATIC half-to-even divergence;
it is not bit-exact decimal rounding: the scaling below happens in float64, so
an input within an ulp of a .5 boundary can still round differently than
Spark/DuckDB's decimal HALF_UP (and for |x|*10^d >= 2^52 the +0.5 offset is
absorbed).  That residual measure-zero boundary class is covered by the
defenses in operators/_common.py: rank on the rounded value with an id
tiebreak, keep twin expression trees operand-identical so cross-engine noise
stays far below the rounding grid, and prefer exact integer/decimal arithmetic
where the semantics allow.
"""

from __future__ import annotations

import numpy as np


def round_half_away(a, decimals: int = 6) -> np.ndarray:
    """Round half away from zero — matches Spark ``F.round`` / DuckDB ``round``.

    numpy/pandas round half-to-even; this scales, offsets by 0.5 in magnitude,
    floors, and restores the sign.  Accepts scalars, numpy arrays, or pandas
    Series; always returns a float64 ndarray (0-d for scalars).
    """
    f = 10.0 ** decimals
    arr = np.asarray(a, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * f + 0.5) / f
