"""Fuzzy autocomplete (Atlas autocomplete + fuzzy): prefix-edit expansion
parity across the banded DP, the closed SQL form, the engine's two physical
paths, and the pure-python oracle."""

import random

import numpy as np
import pytest

from search_engine_spark.analysis.text import prefix_edit_distance_leq


def _lev(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_prefix_dp_matches_brute_force():
    rng = random.Random(11)
    for _ in range(4000):
        q = "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
        t = "".join(rng.choice("abc") for _ in range(rng.randint(0, 8)))
        for k in range(3):
            brute = any(_lev(q, t[:L]) <= k for L in range(len(t) + 1))
            assert prefix_edit_distance_leq(q, t, k) == brute, (q, t, k)


def test_prefix_dp_matches_closed_sql_form():
    # the L-band closed form is what the SQL oracles and the distributed
    # expansion compute — it must equal the DP exactly
    rng = random.Random(12)
    for _ in range(4000):
        q = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
        t = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
        for k in range(1, 3):
            lo, hi = max(1, len(q) - k), len(q) + k
            closed = (len(q) <= k) or any(
                _lev(t[:L], q) <= k for L in range(lo, hi + 1)
            )
            assert prefix_edit_distance_leq(q, t, k) == closed, (q, t, k)


def test_engine_matches_oracle_both_paths(spark, index_tiny, oracle_tiny):
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_tiny)
    for q in ("ol", "beld", "ricx"):
        exp = oracle_tiny.search_prefix_fuzzy(q, k=15, fuzzy=1)
        exp_terms = oracle_tiny.expand_prefix_fuzzy(q, 1)
        assert eng.expand_prefix_fuzzy(q, 1) == exp_terms
        for fd in (False, True):
            res = eng.search(q, k=15, prefix_fuzzy=1, force_distributed=fd)
            got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
            assert [g[0] for g in got] == [h[0] for h in exp.hits], (q, fd)
            assert np.allclose(
                [g[1] for g in got], [h[1] for h in exp.hits], rtol=0, atol=5e-7
            ), (q, fd)
            assert res.total == exp.total, (q, fd)


def test_expansion_superset_of_plain_prefix(spark, index_tiny):
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_tiny)
    assert set(eng.expand_prefix("oi")) <= set(eng.expand_prefix_fuzzy("oi", 1))


def test_validation(spark, index_tiny):
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_tiny)
    with pytest.raises(ValueError, match="single-term"):
        eng.search("oil milk", prefix_fuzzy=1)
    with pytest.raises(ValueError, match="single-term"):
        eng.search("oil", prefix_fuzzy=1, fuzzy=1)
