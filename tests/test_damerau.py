"""Damerau fuzzy (Lucene fuzzy.transpositions, the Atlas default): the OSA
banded DP vs brute force, the k=1 closed form vs DuckDB's unrestricted
damerau_levenshtein, and engine-vs-oracle rank identity on every physical
path — cached dictionary, distributed closed-form expansion (fuzzy=1),
distributed pandas_udf expansion (fuzzy=2), sort and force-distributed
scoring."""

import random

import duckdb
import numpy as np
import pytest

from search_engine_spark.analysis.text import edit_distance_leq, swap_variants


def _osa_brute(a, b):
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def test_banded_osa_matches_brute_force():
    rng = random.Random(7)
    for _ in range(6000):
        a = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 7)))
        b = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 7)))
        for k in range(4):
            assert edit_distance_leq(a, b, k, transpositions=True) == (
                _osa_brute(a, b) <= k
            ), (a, b, k)


def test_k1_closed_form_matches_duckdb_damerau():
    # the distributed expansion at fuzzy=1 and every SQL oracle share
    #   damerau(t, q) <= 1  <=>  levenshtein(t, q) <= 1 OR t IN swaps(q)
    # and at k=1 OSA == unrestricted Damerau == DuckDB damerau_levenshtein
    con = duckdb.connect()
    rng = random.Random(8)
    for _ in range(3000):
        q = "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 6)))
        t = "".join(rng.choice("abcd") for _ in range(rng.randrange(0, 6)))
        dd, lv = con.execute(
            "SELECT damerau_levenshtein(?, ?), levenshtein(?, ?)", [t, q, t, q]
        ).fetchone()
        want = dd <= 1
        assert (lv <= 1 or t in swap_variants(q)) == want, (t, q)
        assert edit_distance_leq(t, q, 1, transpositions=True) == want, (t, q)


def test_osa_exceeds_damerau_only_at_k2_plus():
    # the documented k>=2 divergence ('ca'->'abc': OSA 3, Damerau 2) — the
    # reason the SQL-oracle-gated surfaces pin k=1
    assert not edit_distance_leq("ca", "abc", 2, transpositions=True)
    con = duckdb.connect()
    assert con.execute(
        "SELECT damerau_levenshtein('ca', 'abc')"
    ).fetchone()[0] == 2


def test_swap_variants():
    assert swap_variants("tabel") == ["atbel", "table", "taebl", "tbael"]
    assert swap_variants("aa") == []  # equal adjacent chars swap to identity
    assert swap_variants("x") == []
    assert swap_variants("") == []


@pytest.fixture()
def engine(spark, index_tiny):
    from search_engine_spark.query import SearchEngine

    return SearchEngine(spark, index_tiny)


# betl: lev-1 = {bete, beto}, +transposition belt — a genuinely mixed fold;
# mlik/iol/teh: reachable ONLY via the transposition; multi-term combines two
DAMERAU_QUERIES = [("betl", 1), ("mlik", 1), ("iol", 1), ("mlik iol", 1),
                   ("teh", 1), ("dsoa", 2)]


@pytest.mark.parametrize("force_dist", [False, True])
@pytest.mark.parametrize("kw,f", DAMERAU_QUERIES)
def test_damerau_rank_identity(engine, oracle_tiny, kw, f, force_dist):
    from tests.test_index_engine import assert_rank_identical

    got = engine.search(
        kw, k=10, fuzzy=f, fuzzy_transpositions=True, force_distributed=force_dist
    )
    want = oracle_tiny.search_fuzzy(kw, k=10, fuzzy=f, transpositions=True)
    assert_rank_identical(got, want, f"damerau {kw} f={f} dist={force_dist}")


def test_transpositions_widen_the_expansion(engine, oracle_tiny):
    for qt in ("betl", "mlik", "teh"):
        plain = engine.expand_fuzzy(qt, 1)
        dam = engine.expand_fuzzy(qt, 1, transpositions=True)
        assert set(plain) < set(dam), qt  # strictly wider on these typos
        assert dam == oracle_tiny.expand_fuzzy(qt, 1, transpositions=True)


def test_distributed_expansion_both_shapes(engine, oracle_tiny):
    # force the above-dict-budget path: fuzzy=1 takes the JVM closed form
    # (levenshtein OR isin(swaps)), fuzzy=2 the Arrow pandas_udf OSA filter
    engine._terms_arr = None
    engine._fuzzy_cache.clear()
    assert engine.expand_fuzzy("betl", 1, transpositions=True) == \
        oracle_tiny.expand_fuzzy("betl", 1, transpositions=True)
    assert engine.expand_fuzzy("dsoa", 2, transpositions=True) == \
        oracle_tiny.expand_fuzzy("dsoa", 2, transpositions=True)
    # and the plain-Levenshtein distributed filter still agrees too
    assert engine.expand_fuzzy("betl", 1) == oracle_tiny.expand_fuzzy("betl", 1)


def test_suggest_with_transpositions(engine, oracle_tiny):
    # 'teh' -> 'the' is THE canonical swap typo: distance 2 under plain
    # Levenshtein (no suggestion from a distance-1 scan), 1 with the swap
    assert engine.suggest("teh", fuzzy=1, transpositions=True) == "the"
    assert oracle_tiny.suggest("teh", fuzzy=1, transpositions=True) == "the"
    assert engine.suggest("teh", fuzzy=1) == oracle_tiny.suggest("teh", fuzzy=1)
    for qt in ("mlik", "betl", "milk", "zzzzqqqq"):
        assert engine.suggest(qt, fuzzy=1, transpositions=True) == \
            oracle_tiny.suggest(qt, fuzzy=1, transpositions=True), qt


def test_transpositions_require_fuzzy(engine):
    with pytest.raises(ValueError, match="fuzzy_transpositions"):
        engine.search("milk", fuzzy_transpositions=True)
