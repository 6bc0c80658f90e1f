"""MoreLikeThis (Lucene MLT / Atlas moreLikeThis): deterministic tf-idf term
selection + the standard disjunction, rank-identical to the oracle on both
physical paths."""

import pytest


@pytest.fixture()
def engine(spark, index_tiny):
    from search_engine_spark.query import SearchEngine

    return SearchEngine(spark, index_tiny)


def _texts(oracle):
    v = oracle.terms_sorted
    # enough repeated + rare terms that tf and idf both matter
    return [
        " ".join(v[:3]) + " " + v[0] + " " + v[0],       # heavy tf on v[0]
        " ".join(v[-8:]),                                # tail terms
        v[len(v) // 2] + " zzznotaterm " + v[0],         # absent term mixed in
        "milk oil rice belt milk oil",                   # reference vocab
    ]


@pytest.mark.parametrize("force_dist", [False, True])
def test_mlt_rank_identity(engine, oracle_tiny, force_dist):
    from tests.test_index_engine import assert_rank_identical

    for i, text in enumerate(_texts(oracle_tiny)):
        got = engine.more_like_this(
            text, k=10, max_query_terms=4, force_distributed=force_dist
        )
        want = oracle_tiny.more_like_this(text, k=10, max_query_terms=4)
        assert want.total > 0, text
        assert_rank_identical(got, want, f"mlt[{i}] dist={force_dist}")


def test_mlt_thresholds(engine, oracle_tiny):
    from tests.test_index_engine import assert_rank_identical

    v = oracle_tiny.terms_sorted
    text = f"{v[0]} {v[0]} {v[1]} {v[2]}"
    # min_term_freq=2 keeps only the doubled term
    got = engine.more_like_this(text, k=10, min_term_freq=2)
    want = oracle_tiny.more_like_this(text, k=10, min_term_freq=2)
    assert_rank_identical(got, want, "min_term_freq=2")
    # min_doc_freq above the rarest candidate's df drops it
    dfs = {t: len(oracle_tiny.postings[t]) for t in (v[0], v[1], v[2])}
    cut = sorted(dfs.values())[1]
    got = engine.more_like_this(text, k=10, min_doc_freq=cut)
    want = oracle_tiny.more_like_this(text, k=10, min_doc_freq=cut)
    assert_rank_identical(got, want, f"min_doc_freq={cut}")


def test_mlt_max_query_terms_cutoff_changes_results(engine, oracle_tiny):
    v = oracle_tiny.terms_sorted
    text = " ".join(v[:10])
    full = engine.more_like_this(text, k=10, max_query_terms=25)
    cut = engine.more_like_this(text, k=10, max_query_terms=1)
    assert cut.total <= full.total
    want = oracle_tiny.more_like_this(text, k=10, max_query_terms=1)
    assert cut.total == want.total


def test_mlt_empty_and_errors(engine, spark, tmp_path_factory):
    assert engine.more_like_this("zzznotaterm qqqalsonot", k=5).total == 0
    assert engine.more_like_this("", k=5).total == 0
