"""Multi-field index paths: build, per-field stats, compound search parity.

The reference scores named Lucene fields (should over name+barcode, must over
store_id/wh_id — search_utils.py:79-97,181-203, app.py:472-486).  These tests
pin the engine's field_cols build + search_fields compound path rank- AND
score-identical to OracleMultiFieldIndex on BOTH physical paths, plus the
single-field minimumShouldMatch m-of-n generalization.
"""

import os

import numpy as np
import pytest

from search_engine_spark.analysis.text import tokenize
from search_engine_spark.oracle import OracleIndex, OracleMultiFieldIndex

TITLE_LEN = 6


@pytest.fixture(scope="module")
def mf_rows(webtext_tiny):
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(webtext_tiny, "part-00000.parquet"))
    rows = []
    for url, text in zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist()):
        toks = tokenize(text)
        rows.append(
            (url, {"title": " ".join(toks[:TITLE_LEN]), "body": " ".join(toks[TITLE_LEN:])})
        )
    return rows


@pytest.fixture(scope="module")
def mf_oracle(mf_rows):
    return OracleMultiFieldIndex(mf_rows)


@pytest.fixture(scope="module")
def mf_index(spark, mf_rows, tmp_path_factory):
    from search_engine_spark.index.builder import BuildConfig, build_index

    corpus = str(tmp_path_factory.mktemp("mf") / "corpus")
    spark.createDataFrame(
        [(u, f["title"], f["body"]) for u, f in mf_rows],
        "url string, title string, body string",
    ).write.mode("overwrite").parquet(corpus)
    index_dir = str(tmp_path_factory.mktemp("mf") / "index")
    cfg = BuildConfig(
        block_docs=64, target_ranges=16, min_range_docs=64, n_partitions=8,
        waves=2, field_cols=("title", "body"), positions=True,
    )
    metrics = build_index(spark, corpus, index_dir, cfg=cfg)
    assert metrics["n_docs"] == len(mf_rows)
    return index_dir


@pytest.fixture(scope="module")
def mf_engine(spark, mf_index):
    from search_engine_spark.query.engine import SearchEngine

    return SearchEngine(spark, mf_index)


@pytest.fixture(scope="module")
def q_terms(mf_oracle):
    """Deterministic query terms: the highest-df term of each field (df desc,
    term asc tiebreak), plus a term present in both fields."""

    def top(field):
        cands = [
            (len(pl), t) for (f, t), pl in mf_oracle.postings.items() if f == field
        ]
        return min(cands, key=lambda c: (-c[0], c[1]))[1]

    t_title, t_body = top("title"), top("body")
    both = sorted(
        t
        for (f, t) in mf_oracle.postings
        if f == "title" and ("body", t) in mf_oracle.postings
    )
    assert both, "fixture must contain a term present in both fields"
    return t_title, t_body, both[0]


def _check(eng, oracle, must, should, msm, k=15, skip=0, must_not=(), filter=()):
    exp = oracle.search_compound(
        must=must, should=should, k=k, skip=skip, minimum_should_match=msm,
        must_not=must_not, filter=filter,
    )
    for fd in (False, True):
        res = eng.search_fields(
            must=must, should=should, k=k, skip=skip,
            minimum_should_match=msm, force_distributed=fd,
            must_not=must_not, filter=filter,
        )
        got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
        assert [g[0] for g in got] == [h[0] for h in exp.hits], (must, should, msm, fd)
        assert np.allclose(
            [g[1] for g in got], [h[1] for h in exp.hits], rtol=0, atol=1e-12
        ), (must, should, msm, fd)
        assert res.total == exp.total, (must, should, msm, fd, res.total, exp.total)
    return exp


def test_must_not_excludes(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    base = _check(mf_engine, mf_oracle, [("title", t_title)], [], 0)
    exp = _check(
        mf_engine, mf_oracle, [("title", t_title)], [], 0,
        must_not=[("body", t_body)],
    )
    assert 0 < exp.total < base.total  # something survived, something dropped
    # MUST_NOT scores nothing: every surviving doc keeps its positive-only
    # score bit-for-bit
    base_scores = dict(base.hits)
    for d, s in exp.hits:
        if d in base_scores:
            assert s == base_scores[d], d
    # and every excluded doc really contains the excluded key
    kept = {d for d, _ in exp.hits}
    pl = mf_oracle.postings[("body", t_body)]
    for d, _ in base.hits:
        if d not in kept:
            assert d in pl, d


def test_must_not_absent_term_is_noop(mf_engine, mf_oracle, q_terms):
    t_title = q_terms[0]
    base = _check(mf_engine, mf_oracle, [("title", t_title)], [], 0)
    res = mf_engine.search_fields(
        must=[("title", t_title)], must_not=[("body", "zzzzznotaterm")], k=15
    )
    assert res.total == base.total
    assert [int(d) for d in res.page["doc_id"]] == [h[0] for h in base.hits]


def test_must_not_requires_positive_clause(mf_engine, mf_oracle, q_terms):
    t_body = q_terms[1]
    with pytest.raises(ValueError, match="must_not requires"):
        mf_engine.search_fields(must_not=[("body", t_body)], k=5)
    with pytest.raises(ValueError, match="must_not requires"):
        mf_oracle.search_compound(must_not=[("body", t_body)], k=5)


def test_must_not_wand_mode_raises(mf_engine, q_terms):
    t_title, t_body, _ = q_terms
    with pytest.raises(ValueError, match="pure-should"):
        mf_engine.search_fields(
            should=[("title", t_title)], must_not=[("body", t_body)], mode="wand"
        )


def test_clause_boost_rank_and_score_identity(mf_engine, mf_oracle, q_terms):
    _, _, both = q_terms
    boosted = [
        {"field": "title", "query": both, "boost": 3.0},
        ("body", both),
    ]
    exp = _check(mf_engine, mf_oracle, [], boosted, 1)
    plain = _check(mf_engine, mf_oracle, [], [("title", both), ("body", both)], 1)
    assert exp.total == plain.total  # boost rescores, never filters
    # the boost genuinely moved scores (title contribution tripled)
    assert any(
        abs(s1 - s2) > 1e-9
        for (_, s1), (_, s2) in zip(exp.hits, plain.hits)
    )


def test_clause_boost_zero_kills_contribution(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    # boost=0: the clause still gates matching but scores nothing —
    # results equal the other clause's scores over the intersection
    exp = _check(
        mf_engine, mf_oracle,
        [{"field": "title", "query": t_title, "boost": 0.0}, ("body", t_body)],
        [], 0,
    )
    assert exp.total > 0
    with pytest.raises(ValueError, match="boost must be >= 0"):
        mf_engine.search_fields(
            must=[{"field": "title", "query": t_title, "boost": -1.0}], k=5
        )


def test_filter_clause_matches_like_must_scores_nothing(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    # same doc set as the must form, but the filter clause's contribution is
    # gone from every score — only the should clause scores
    as_must = _check(
        mf_engine, mf_oracle, [("title", t_title)], [("body", t_body)], 0
    )
    as_filter = _check(
        mf_engine, mf_oracle, [], [("body", t_body)], 0,
        filter=[("title", t_title)],
    )
    assert as_filter.total == as_must.total > 0
    assert [d for d, _ in as_filter.hits] != [] and all(
        fs <= ms + 1e-12
        for (_, fs), (_, ms) in zip(
            sorted(as_filter.hits), sorted(h for h in as_must.hits
                                           if h[0] in {d for d, _ in as_filter.hits})
        )
    )


def test_filter_only_query_scores_zero(mf_engine, mf_oracle, q_terms):
    t_title = q_terms[0]
    exp = _check(mf_engine, mf_oracle, [], [], 0, filter=[("title", t_title)])
    assert exp.total > 0
    assert all(s == 0.0 for _, s in exp.hits)
    # ranked purely by the doc_id tiebreak
    ids = [d for d, _ in exp.hits]
    assert ids == sorted(ids)


def test_filter_with_should_msm_zero_is_optional(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    # Lucene: with a required (filter) clause present, shoulds at msm=0 are
    # pure scoring — the total equals the filter clause's match count
    only_filter = _check(mf_engine, mf_oracle, [], [], 0,
                         filter=[("title", t_title)])
    both = _check(mf_engine, mf_oracle, [], [("body", t_body)], 0,
                  filter=[("title", t_title)])
    assert both.total == only_filter.total


def test_filter_satisfies_must_not_positivity(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    exp = _check(mf_engine, mf_oracle, [], [], 0,
                 filter=[("title", t_title)], must_not=[("body", t_body)])
    assert exp.total >= 0  # parity checked by _check; no ValueError raised


def test_filter_wand_mode_raises(mf_engine, q_terms):
    t_title, t_body, _ = q_terms
    with pytest.raises(ValueError, match="pure-should"):
        mf_engine.search_fields(
            should=[("body", t_body)], filter=[("title", t_title)], mode="wand"
        )


def test_wildcard_clause_field_scoped(mf_engine, mf_oracle, q_terms):
    t_body = q_terms[1]
    pattern = t_body[0] + "*"
    clause = [{"field": "body", "query": pattern, "kind": "wildcard"}]
    exp = _check(mf_engine, mf_oracle, [], clause, 1)
    assert exp.total > 0
    # the expansion is scoped to the BODY vocabulary: every expanded key is
    # body-prefixed and matches the pattern
    keys = mf_engine._clause_terms(clause[0])
    sep = mf_engine.field_sep
    assert keys and all(k.startswith(f"body{sep}{t_body[0]}") for k in keys)
    want = sorted(
        f"body{sep}{t}" for (f, t) in mf_oracle.postings
        if f == "body" and t.startswith(t_body[0])
    )
    assert keys == want
    # distributed dictionary path: startswith + suffix-rlike over term stats
    saved = mf_engine._terms_arr
    try:
        mf_engine._terms_arr = None
        assert mf_engine._clause_terms(clause[0]) == want
    finally:
        mf_engine._terms_arr = saved


def test_regex_clause_field_scoped(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    pattern = f"({t_title}|{t_body})"
    clause = [{"field": "body", "query": pattern, "kind": "regex"}]
    exp = _check(mf_engine, mf_oracle, [], clause, 1)
    assert exp.total > 0
    keys = mf_engine._clause_terms(clause[0])
    sep = mf_engine.field_sep
    # scoped to BODY: only body-prefixed keys, exactly the alternation hits
    want = sorted(
        f"body{sep}{t}" for (f, t) in mf_oracle.postings
        if f == "body" and t in (t_title, t_body)
    )
    assert keys == want
    saved = mf_engine._terms_arr
    try:
        mf_engine._terms_arr = None
        assert mf_engine._clause_terms(clause[0]) == want
    finally:
        mf_engine._terms_arr = saved


def test_clause_boost_wand_parity(mf_engine, mf_oracle, q_terms):
    # boosts fold into per-key idf, so WAND's block bounds scale with them:
    # wand == sort == oracle on a boosted pure-should disjunction
    _, _, both = q_terms
    boosted = [
        {"field": "title", "query": both, "boost": 2.5},
        {"field": "body", "query": both, "boost": 0.5},
    ]
    exp = mf_oracle.search_compound(should=boosted, k=15, minimum_should_match=1)
    for mode in ("sort", "wand"):
        res = mf_engine.search_fields(
            should=boosted, k=15, minimum_should_match=1, mode=mode,
            force_distributed=(mode == "sort"),
        )
        got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
        assert [g[0] for g in got] == [h[0] for h in exp.hits], mode
        assert np.allclose(
            [g[1] for g in got], [h[1] for h in exp.hits], rtol=0, atol=1e-12
        ), mode
        assert res.total == exp.total, mode


def test_field_stats_match_oracle(mf_engine, mf_oracle):
    assert set(mf_engine.fields) == set(mf_oracle.fields)
    for f, (dc, avgdl) in mf_oracle.fields.items():
        assert mf_engine.fields[f]["doc_count"] == dc
        assert mf_engine.fields[f]["avgdl"] == pytest.approx(avgdl, abs=1e-12)


def test_should_over_two_fields(mf_engine, mf_oracle, q_terms):
    # the reference's single-term flagship: should over both paths, msm=1
    _, _, both = q_terms
    exp = _check(mf_engine, mf_oracle, [], [("title", both), ("body", both)], 1)
    assert exp.total > 0


def test_must_plus_should(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    exp = _check(mf_engine, mf_oracle, [("title", t_title)], [("body", t_body)], 1)
    assert exp.total > 0


def test_must_only_two_clauses(mf_engine, mf_oracle, q_terms):
    t_title, t_body, _ = q_terms
    _check(mf_engine, mf_oracle, [("title", t_title), ("body", t_body)], [], 0)


def test_msm_two_of_three(mf_engine, mf_oracle, q_terms):
    t_title, t_body, both = q_terms
    should = [("title", t_title), ("body", t_body), ("body", both)]
    e2 = _check(mf_engine, mf_oracle, [], should, 2)
    e3 = _check(mf_engine, mf_oracle, [], should, 3)
    assert e3.total <= e2.total


def test_pagination(mf_engine, mf_oracle, q_terms):
    _, _, both = q_terms
    _check(mf_engine, mf_oracle, [], [("title", both), ("body", both)], 1, k=5, skip=7)


def test_multi_term_text_clause(mf_engine, mf_oracle, q_terms):
    # a text clause is a disjunction of its analyzed terms (Lucene text query)
    t_title, t_body, both = q_terms
    _check(mf_engine, mf_oracle, [("body", f"{t_body} {both}")], [], 0)


def test_absent_must_term_empty(mf_engine):
    res = mf_engine.search_fields(must=[("title", "zzzzznotaterm")], k=5)
    assert res.total == 0 and len(res.page) == 0


def test_prefix_clause(mf_engine, mf_oracle, q_terms):
    t_title = q_terms[0]
    prefix = t_title[:2]
    # oracle expansion: field vocabulary terms starting with the prefix,
    # scored as one disjunction of (field, term) keys
    exp_terms = sorted(
        t for (f, t) in mf_oracle.postings if f == "title" and t.startswith(prefix)
    )
    assert exp_terms
    # the expansion is one disjunction: n single-term should clauses with
    # msm=1 filter and score identically (every present key contributes),
    # and single-term clause texts dodge the multi-term query preprocessing
    exp = mf_oracle.search_compound(
        should=[("title", t) for t in exp_terms], k=15, minimum_should_match=1
    )
    for fd in (False, True):
        res = mf_engine.search_fields(
            should=[{"field": "title", "query": prefix, "kind": "prefix"}],
            k=15, force_distributed=fd,
        )
        got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
        assert [g[0] for g in got] == [h[0] for h in exp.hits]
        assert np.allclose([g[1] for g in got], [h[1] for h in exp.hits], atol=1e-12)


def test_unknown_field_raises(mf_engine):
    with pytest.raises(ValueError, match="unknown field"):
        mf_engine.search_fields(should=[("nope", "x")])


def test_single_field_index_rejects_field_search(spark, index_tiny):
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_tiny)
    with pytest.raises(ValueError, match="multi-field index"):
        eng.search_fields(should=[("title", "x")])


def test_fuzzy_clause_should(mf_engine, mf_oracle):
    # Atlas text clause's fuzzy option over a named path: same expansion,
    # field-scoped — engine slices the prefixed dictionary, oracle scans
    # the field vocabulary
    fz = {"field": "body", "query": "melk", "kind": "fuzzy", "fuzzy": 1}
    exp = _check(mf_engine, mf_oracle, [], [fz], 1)
    assert exp.total > 0


def test_fuzzy_clause_in_must_mix(mf_engine, mf_oracle):
    # a fuzzy MUST clause (any variant present) combined with a should —
    # the shape n separate clauses cannot model
    must = [{"field": "body", "query": "melk", "kind": "fuzzy"}]
    should = [("title", "the"), ("body", "oil")]
    _check(mf_engine, mf_oracle, must, should, 1)


def test_fuzzy_clause_transpositions(mf_engine, mf_oracle):
    fz = {"field": "body", "query": "mlik", "kind": "fuzzy", "fuzzy": 1,
          "transpositions": True}
    exp = _check(mf_engine, mf_oracle, [], [fz], 1)
    assert exp.total > 0  # 'mlik' reaches 'milk' only via the swap
    plain = mf_oracle.search_compound(
        should=[{"field": "body", "query": "mlik", "kind": "fuzzy"}],
        minimum_should_match=1,
    )
    assert exp.total >= plain.total


def test_fuzzy_clause_expansion_is_field_scoped(mf_engine, mf_oracle):
    for f in ("title", "body"):
        got = mf_engine._expand_fuzzy_in_field(f, "melk", 1, False, None)
        sep = mf_engine.field_sep
        vocab = sorted(t for (ff, t) in mf_oracle.postings if ff == f)
        from search_engine_spark.analysis.text import edit_distance_leq

        want = [f"{f}{sep}{t}" for t in vocab if edit_distance_leq(t, "melk", 1)]
        assert got == want, f
    # distinct fields genuinely expand differently on this fixture OR at
    # least the keys carry their own field prefix
    t_keys = mf_engine._expand_fuzzy_in_field("title", "melk", 1, False, None)
    b_keys = mf_engine._expand_fuzzy_in_field("body", "melk", 1, False, None)
    assert all(k.startswith("title") for k in t_keys)
    assert all(k.startswith("body") for k in b_keys)


def test_fuzzy_clause_distributed_dictionary(mf_engine, mf_oracle):
    # above-dict-budget path: prefix-pruned term-stats scan on the suffix
    cached = mf_engine._expand_fuzzy_in_field("body", "melk", 1, False, None)
    cached_tr = mf_engine._expand_fuzzy_in_field("body", "mlik", 1, True, None)
    saved = mf_engine._terms_arr
    try:
        mf_engine._terms_arr = None
        mf_engine._fuzzy_cache.clear()
        assert mf_engine._expand_fuzzy_in_field("body", "melk", 1, False, None) == cached
        assert mf_engine._expand_fuzzy_in_field("body", "mlik", 1, True, None) == cached_tr
    finally:
        mf_engine._terms_arr = saved
        mf_engine._fuzzy_cache.clear()


def _body_bigram(mf_rows):
    """A deterministic bigram adjacent in >= 2 docs' BODY streams."""
    import collections

    c = collections.Counter()
    for _, f in mf_rows:
        toks = tokenize(f["body"])
        c.update({f"{a} {b}" for a, b in zip(toks, toks[1:])})
    bg, n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert n >= 2
    return bg


def test_field_phrase_rank_identity(mf_engine, mf_oracle, mf_rows):
    bg = _body_bigram(mf_rows)
    exp = mf_oracle.search_phrase_field("body", bg, k=15)
    assert exp.total >= 2
    for fd in (False, True):
        res = mf_engine.search_field_phrase("body", bg, k=15, force_distributed=fd)
        got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
        assert [g[0] for g in got] == [h[0] for h in exp.hits], fd
        assert np.allclose(
            [g[1] for g in got], [h[1] for h in exp.hits], rtol=0, atol=5e-7
        ), fd
        assert res.total == exp.total, fd


def test_field_phrase_is_field_scoped(mf_engine, mf_oracle, mf_rows):
    # a bigram straddling the title/body boundary is adjacent in the DOC
    # token stream but in NEITHER field's stream — the field-scoped phrase
    # must not match it (positions are field-local by construction)
    straddle = None
    for _, f in mf_rows:
        t, b = tokenize(f["title"]), tokenize(f["body"])
        if t and b:
            straddle = f"{t[-1]} {b[0]}"
            bg = straddle
            # only usable if this pair is adjacent in no single field stream
            if (mf_oracle.search_phrase_field("title", bg).total == 0
                    and mf_oracle.search_phrase_field("body", bg).total == 0):
                break
            straddle = None
    if straddle is None:
        pytest.skip("no straddling bigram absent from both field streams")
    for fld in ("title", "body"):
        res = mf_engine.search_field_phrase(fld, straddle, k=5)
        assert res.total == 0, (fld, straddle)


def test_field_phrase_validation(mf_engine, spark, index_tiny):
    from search_engine_spark.query.engine import SearchEngine

    with pytest.raises(ValueError, match="unknown field"):
        mf_engine.search_field_phrase("nope", "a b")
    single = SearchEngine(spark, index_tiny)
    with pytest.raises(ValueError, match="multi-field"):
        single.search_field_phrase("title", "a b")


def test_compound_wand_rank_identity(mf_engine, mf_oracle, q_terms):
    # pure-should msm<=1 compound == a plain disjunction over prefixed keys:
    # the WAND kernel must be bit-identical to the sort kernel and the
    # oracle, with per-field avgdl in both the scores and the pruning
    # bounds (θ floor active: per-field-baked mtn is attained)
    t_title, t_body, both = q_terms
    shapes = [
        [("title", t_title), ("body", t_body)],
        [("title", both), ("body", both)],
        [{"field": "body", "query": "melk", "kind": "fuzzy"}],
    ]
    for should in shapes:
        exp = mf_oracle.search_compound(should=should, k=15, minimum_should_match=1)
        srt = mf_engine.search_fields(should=should, k=15, force_distributed=True)
        wnd = mf_engine.search_fields(should=should, k=15, mode="wand")
        for res in (srt, wnd):
            got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
            assert [g[0] for g in got] == [h[0] for h in exp.hits], should
            assert np.allclose(
                [g[1] for g in got], [h[1] for h in exp.hits], rtol=0, atol=1e-12
            ), should
            assert res.total == exp.total, should


def test_compound_wand_auto_dispatch_and_validation(mf_engine):
    # auto at fixture scale must pick sort (the measured crossover) and
    # record its estimate; unsupported shapes must raise, not silently sort
    res = mf_engine.search_fields(
        should=[("title", "the"), ("body", "the")], k=10, mode="auto"
    )
    assert mf_engine.last_dispatch["mode"] in ("sort", "wand")
    assert res.total > 0
    with pytest.raises(ValueError, match="pure-should"):
        mf_engine.search_fields(
            must=[("title", "the")], should=[("body", "oil")], mode="wand"
        )
    with pytest.raises(ValueError, match="pure-should"):
        mf_engine.search_fields(
            should=[("title", "the"), ("body", "the")],
            minimum_should_match=2, mode="wand",
        )
    with pytest.raises(ValueError, match="mode must be"):
        mf_engine.search_fields(should=[("title", "the")], mode="nope")


def test_multifield_index_rejects_plain_search(mf_engine):
    # bare terms never match "<field><sep><term>" posting keys — plain
    # search() must fail loud instead of silently returning an empty page
    with pytest.raises(ValueError, match="search_fields"):
        mf_engine.search("milk")


def test_multifield_index_rejects_bare_dictionary_surfaces(mf_engine):
    # the same silent-empty failure mode exists for every bare-term
    # dictionary surface: expansion/suggest must fail loud too
    with pytest.raises(ValueError, match="multi-field"):
        mf_engine.expand_fuzzy("milk", 1)
    with pytest.raises(ValueError, match="multi-field"):
        mf_engine.expand_prefix_fuzzy("mil", 1)
    with pytest.raises(ValueError, match="multi-field"):
        mf_engine.expand_phonetic("milk")
    with pytest.raises(ValueError, match="multi-field"):
        mf_engine.suggest("milk")
    with pytest.raises(ValueError, match="multi-field"):
        mf_engine.expand_wildcard("m?lk")
    with pytest.raises(ValueError, match="multi-field"):
        mf_engine.expand_regex("m.lk")
    with pytest.raises(ValueError, match="multi-field"):
        mf_engine.more_like_this("milk oil")


def test_field_build_resume(spark, mf_rows, tmp_path_factory, mf_oracle, q_terms):
    """Kill after wave 1, resume: field layout honored, results identical."""
    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine

    corpus = str(tmp_path_factory.mktemp("mfr") / "corpus")
    spark.createDataFrame(
        [(u, f["title"], f["body"]) for u, f in mf_rows],
        "url string, title string, body string",
    ).write.mode("overwrite").parquet(corpus)
    index_dir = str(tmp_path_factory.mktemp("mfr") / "index")
    cfg = BuildConfig(
        block_docs=64, target_ranges=16, min_range_docs=64, n_partitions=8,
        waves=2, field_cols=("title", "body"),
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, index_dir, cfg=cfg, fail_after_wave=1)
    # resume with a cfg that LACKS field_cols: the committed layout wins
    metrics = build_index(
        spark, corpus, index_dir,
        cfg=BuildConfig(block_docs=64, target_ranges=16, min_range_docs=64,
                        n_partitions=8, waves=2),
    )
    assert metrics["partitions_skipped"] > 0
    eng = SearchEngine(spark, index_dir)
    _, _, both = q_terms
    _check(eng, mf_oracle, [], [("title", both), ("body", both)], 1)


# --------------------------- single-field m-of-n ---------------------------


def test_min_should_match_m_of_n(spark, index_tiny, oracle_tiny):
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_tiny)
    kw = "cadbury dairy milk"
    n = len(set(tokenize(kw)))
    for m in range(1, n + 1):
        exp = oracle_tiny.search_min_should_match(kw, m, k=15)
        for kwargs in (
            {},  # driver path
            {"force_distributed": True, "mode": "sort"},
            {"force_distributed": True, "mode": "wand"},
        ):
            res = eng.search(kw, k=15, min_should_match=m, **kwargs)
            got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
            assert [g[0] for g in got] == [h[0] for h in exp.hits], (m, kwargs)
            assert np.allclose(
                [g[1] for g in got], [h[1] for h in exp.hits], rtol=0, atol=5e-7
            ), (m, kwargs)
            assert res.total == exp.total, (m, kwargs)
    # m == n must equal conjunctive
    conj = eng.search(kw, k=15, conjunctive=True)
    msm_n = eng.search(kw, k=15, min_should_match=n)
    assert list(conj.page["doc_id"]) == list(msm_n.page["doc_id"])
    assert conj.total == msm_n.total


def test_min_should_match_validation(spark, index_tiny):
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_tiny)
    with pytest.raises(ValueError, match="exclusive"):
        eng.search("a b", min_should_match=1, conjunctive=True)
    with pytest.raises(ValueError, match="plain term"):
        eng.search("a b", min_should_match=1, fuzzy=1)


# ------------------------- per-field bound baking --------------------------


def test_per_field_mtn_baked(spark, mf_engine, mf_index):
    """Every block's max_tf_norm equals the max tf_norm recomputed at ITS
    field's avgdl (tight + attained), and the smaller-avgdl field's bounds
    are strictly tighter than the old max-avgdl bake somewhere."""
    from search_engine_spark.index.builder import B, K1
    from search_engine_spark.index.codec import decode_postings

    assert mf_engine.per_field_mtn is True
    sep = mf_engine.field_sep
    avgdl = {f: float(v["avgdl"]) for f, v in mf_engine.fields.items()}
    amax = max(avgdl.values())
    rows = (
        spark.read.parquet(os.path.join(mf_index, "segments"))
        .select("term", "max_tf_norm", "postings")
        .collect()
    )
    assert rows
    tighter = 0
    for r in rows:
        field = r["term"].split(sep, 1)[0]
        _, tf, dl = decode_postings(r["postings"])
        tf = tf.astype(np.float64)
        dl = dl.astype(np.float64)
        want = float(np.max(tf / (tf + K1 * (1.0 - B + B * dl / avgdl[field]))))
        assert r["max_tf_norm"] == pytest.approx(want, rel=1e-12), r["term"]
        scalar = float(np.max(tf / (tf + K1 * (1.0 - B + B * dl / amax))))
        if want < scalar - 1e-12:
            tighter += 1
    assert tighter > 0


def test_wand_theta_floor_active_multifield(mf_engine, mf_oracle, q_terms):
    """With per-field-baked bounds the per-range achievable θ floor engages
    on compound disjunctions — and stays rank-identical to the oracle."""
    _, _, both = q_terms
    should = [("title", both), ("body", both)]
    exp = mf_oracle.search_compound(should=should, k=2, minimum_should_match=1)
    res = mf_engine.search_fields(should=should, k=2, mode="wand")
    lw = mf_engine.last_wand
    assert lw["theta_floor"] is not None and lw["theta_floor"] > 0
    assert lw["theta"] is not None and lw["theta"] >= lw["theta_floor"] - 1e-12
    got = [(int(d), float(s)) for d, s in zip(res.page["doc_id"], res.page["score"])]
    assert [g[0] for g in got] == [h[0] for h in exp.hits]
    assert np.allclose(
        [g[1] for g in got], [h[1] for h in exp.hits], rtol=0, atol=1e-12
    )
    assert res.total == exp.total


def test_compact_rejects_multifield(spark, mf_index, tmp_path_factory):
    from search_engine_spark.index.compact import compact_index

    out = str(tmp_path_factory.mktemp("mfc") / "out")
    with pytest.raises(ValueError, match="multi-field"):
        compact_index(spark, mf_index, out)


def test_ingest_rejects_multifield(spark, mf_index):
    from search_engine_spark.streaming.ingest import ingest_batch

    batch = spark.createDataFrame(
        [("u://x", "some text")], "url string, text string"
    )
    with pytest.raises(ValueError, match="multi-field"):
        ingest_batch(spark, batch, mf_index, epoch=99)
