"""Wildcard matching (the Atlas/Lucene ``wildcard`` operator): one compiled
pattern definition across stacks (python regex / Spark rlike / DuckDB LIKE),
prefix-bounded dictionary expansion on both dictionary paths, and engine
rank+score identity vs the oracle on both physical paths."""

import re

import pytest

from search_engine_spark.analysis.text import wildcard_pattern_parts


def test_pattern_parts():
    assert wildcard_pattern_parts("s?a*") == ("s", "^s.a.*$")
    assert wildcard_pattern_parts("OIL") == ("oil", "^oil$")
    assert wildcard_pattern_parts("*") == ("", "^.*$")
    assert wildcard_pattern_parts("a2?") == ("a2", "^a2.$")
    for bad in ("", "a[b", "a b", "é*", "a%"):
        with pytest.raises(ValueError, match="wildcard pattern"):
            wildcard_pattern_parts(bad)


def _brute(oracle, pattern):
    _, regex = wildcard_pattern_parts(pattern)
    rx = re.compile(regex)
    return [t for t in oracle.terms_sorted if rx.match(t)]


@pytest.fixture()
def engine(spark, index_tiny):
    from search_engine_spark.query import SearchEngine

    return SearchEngine(spark, index_tiny)


PATTERNS = ["o?l", "m*k", "b?lt", "*il", "r*", "*", "zzz*q"]


def test_expansion_parity_both_dictionary_paths(engine, oracle_tiny):
    nonempty = 0
    for p in PATTERNS:
        want = _brute(oracle_tiny, p)
        assert engine.expand_wildcard(p) == want, p
        assert oracle_tiny.expand_wildcard(p) == want, p
        nonempty += bool(want)
    assert nonempty >= 4  # the fixture vocabulary really exercises these
    # above-dict-budget path: startswith + rlike over distributed term stats
    engine._terms_arr = None
    for p in ("o?l", "m*k", "*il", "zzz*q"):
        assert engine.expand_wildcard(p) == _brute(oracle_tiny, p), p


def test_max_expansions_cap(engine, oracle_tiny):
    full = engine.expand_wildcard("*")
    assert full == oracle_tiny.terms_sorted
    assert engine.expand_wildcard("*", max_expansions=3) == full[:3]
    engine._terms_arr = None
    assert engine.expand_wildcard("*", max_expansions=3) == full[:3]


@pytest.mark.parametrize("force_dist", [False, True])
@pytest.mark.parametrize("pattern", ["o?l", "m*k", "*il", "b?lt", "zzz*q"])
def test_wildcard_rank_identity(engine, oracle_tiny, pattern, force_dist):
    from tests.test_index_engine import assert_rank_identical

    got = engine.search(pattern, k=10, wildcard=True, force_distributed=force_dist)
    want = oracle_tiny.search_wildcard(pattern, k=10)
    assert_rank_identical(got, want, f"wildcard {pattern} dist={force_dist}")


def test_wildcard_matches_plain_search_on_literal(engine, oracle_tiny):
    # a wildcard-free single-term pattern == the exact-term disjunction;
    # compare against the oracle's exact scoring of that one term
    t = oracle_tiny.terms_sorted[len(oracle_tiny.terms_sorted) // 2]
    from tests.test_index_engine import assert_rank_identical

    got = engine.search(t, k=10, wildcard=True)
    want = oracle_tiny.search_wildcard(t, k=10)
    assert_rank_identical(got, want, f"literal {t}")
    assert engine.expand_wildcard(t) == [t]


def test_validation(engine):
    for bad in (
        dict(fuzzy=1), dict(prefix_fuzzy=1), dict(conjunctive=True),
        dict(min_should_match=1), dict(phrase=True),
    ):
        with pytest.raises(ValueError, match="wildcard"):
            engine.search("o?l", wildcard=True, **bad)
    with pytest.raises(ValueError, match="phonetic"):
        engine.search("o?l", wildcard=True, phonetic=True)
    with pytest.raises(ValueError, match="wildcard pattern"):
        engine.search("a[b", wildcard=True)


# ---------------------------------------------------------------------------
# regex operator (wildcard's general form, same dialect-safe-subset policy)
# ---------------------------------------------------------------------------

from search_engine_spark.analysis.text import regex_pattern_parts


def test_regex_pattern_parts():
    assert regex_pattern_parts("oil") == ("oil", "oil")
    assert regex_pattern_parts("sc*an") == ("s", "sc*an")
    assert regex_pattern_parts("tab[lr]e?") == ("tab", "tab[lr]e?")
    assert regex_pattern_parts("s(can|low)|gr.up")[0] == ""  # alternation: no prefix
    for bad in ("", "a{2}", "(?i)x", "a\\d", "a[", "A*", "a^b", "x$"):
        with pytest.raises(ValueError):
            regex_pattern_parts(bad)


def _brute_rx(oracle, pattern):
    _, src = regex_pattern_parts(pattern)
    rx = re.compile(src)
    return [t for t in oracle.terms_sorted if rx.fullmatch(t)]


RX_PATTERNS = ["o.l", "m.*k", "(mil|oi)[kl]", "r(ice|s)|belt", "zzz+q"]


def test_regex_expansion_parity_both_dictionary_paths(engine, oracle_tiny):
    nonempty = 0
    for p in RX_PATTERNS:
        want = _brute_rx(oracle_tiny, p)
        assert engine.expand_regex(p) == want, p
        assert oracle_tiny.expand_regex(p) == want, p
        nonempty += bool(want)
    assert nonempty >= 3
    engine._terms_arr = None  # JVM rlike path must agree with python re
    for p in RX_PATTERNS:
        assert engine.expand_regex(p) == _brute_rx(oracle_tiny, p), ("dist", p)


@pytest.mark.parametrize("force_dist", [False, True])
@pytest.mark.parametrize("pattern", RX_PATTERNS)
def test_regex_rank_identity(engine, oracle_tiny, pattern, force_dist):
    from tests.test_index_engine import assert_rank_identical

    got = engine.search(pattern, k=10, regex=True, force_distributed=force_dist)
    want = oracle_tiny.search_regex(pattern, k=10)
    assert_rank_identical(got, want, f"regex {pattern} dist={force_dist}")


def test_regex_validation(engine):
    for bad in (dict(fuzzy=1), dict(wildcard=True), dict(phrase=True),
                dict(min_should_match=1)):
        with pytest.raises(ValueError, match="wildcard|regex"):
            engine.search("o.l", regex=True, **bad)
    with pytest.raises(ValueError, match="regex"):
        engine.search("a{2}", regex=True)
