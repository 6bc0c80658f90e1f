"""Phonetic matching (SURVEY §2 A11, the reference's dead "sounds_like"
pipeline): the pinned Soundex key agrees three ways (python / Spark columns /
DuckDB chain) over a real vocabulary, and the engine's phonetic search is
rank-identical to the oracle on both physical paths."""

import duckdb
import numpy as np
import pytest

from search_engine_spark.analysis.text import soundex_key


def test_soundex_key_pins():
    # classic published examples (this variant: h/w key as vowels)
    assert soundex_key("robert") == soundex_key("rupert") == "R163"
    assert soundex_key("pfister") == "P236"
    assert soundex_key("tymczak") == "T522"
    assert soundex_key("honeyman") == "H555"
    assert soundex_key("milk") == soundex_key("melk") == soundex_key("mlik") == "M420"
    # total on non-[a-z]+: identity key, no invented phonetics
    assert soundex_key("x9z") == "x9z"
    assert soundex_key("ña") == "ña"
    assert soundex_key("a") == "A000"


def test_key_parity_three_ways(spark, oracle_tiny):
    from search_engine_spark.operators.fulltext import _soundex_sql
    from search_engine_spark.query.engine import soundex_key_col

    # the synthetic fixture vocabulary happens to contain ZERO terms with
    # adjacent same-code letters, which is exactly the class where DuckDB's
    # RE2 regexp (no backreferences — '(.)\\1+' silently no-ops) diverged
    # from python/Spark before the per-digit dedup fix; pin that class
    # explicitly so fixture luck can never hide it again
    dedup_needing = [
        "pfister", "stremm", "aabbcc", "pass", "agg", "rrrr", "hall",
        "jazz", "pff", "ashcraft", "honeyman", "bookkeeper",
    ]
    terms = sorted(set(oracle_tiny.terms_sorted) | set(dedup_needing))
    want = [soundex_key(t) for t in terms]

    sdf = spark.createDataFrame([(t,) for t in terms], "term string")
    import pyspark.sql.functions as F

    got_spark = [
        r["k"]
        for r in sdf.select(soundex_key_col(F.col("term")).alias("k"), "term")
        .orderBy("term").collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_soundex_sql('term')} FROM (SELECT unnest(?) AS term)",
            [terms],
        ).fetchall()
    ]
    assert got_duck == want


@pytest.fixture()
def engine(spark, index_tiny):
    from search_engine_spark.query import SearchEngine

    return SearchEngine(spark, index_tiny)


PHONETIC_QUERIES = ["melk", "mlik", "melk oli", "reis", "zzzzqqqq"]


@pytest.mark.parametrize("force_dist", [False, True])
@pytest.mark.parametrize("kw", PHONETIC_QUERIES)
def test_phonetic_rank_identity(engine, oracle_tiny, kw, force_dist):
    from tests.test_index_engine import assert_rank_identical

    got = engine.search(kw, k=10, phonetic=True, force_distributed=force_dist)
    want = oracle_tiny.search_phonetic(kw, k=10)
    assert_rank_identical(got, want, f"phonetic {kw} dist={force_dist}")


def test_expansion_parity_incl_distributed(engine, oracle_tiny):
    for qt in ("melk", "oli", "belt", "zzzzqqqq"):
        assert engine.expand_phonetic(qt) == oracle_tiny.expand_phonetic(qt), qt
    # above-dict-budget path: the JVM translate/regexp chain over term stats
    engine._terms_arr = None
    engine._fuzzy_cache.clear()
    for qt in ("melk", "belt"):
        assert engine.expand_phonetic(qt) == oracle_tiny.expand_phonetic(qt), qt


def test_phonetic_reaches_beyond_fuzzy(engine):
    # 'reis' is >1 edit from 'rice' yet phonetically equal (R200) — the
    # surface fuzzy can't serve and phonetic exists for
    assert "rice" in engine.expand_phonetic("reis")
    assert "rice" not in engine.expand_fuzzy("reis", 1)


def test_validation(engine):
    for bad in (
        dict(fuzzy=1), dict(prefix_fuzzy=1), dict(conjunctive=True),
        dict(min_should_match=1),
    ):
        with pytest.raises(ValueError, match="phonetic"):
            engine.search("melk oli", phonetic=True, **bad)
