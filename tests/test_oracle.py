import math

from search_engine_spark.fixtures.webtext import generate_rows
from search_engine_spark.oracle import AVAIL_BOOST, CONSTANT_BOOST, OracleIndex, bm25


def make_index(n=1000):
    cols = generate_rows(0, n)
    return OracleIndex(list(zip(cols["url"], cols["text"])))


def test_bm25_formula_pinned():
    # hand-computed: tf=2, df=3, dl=100, N=1000, avgdl=110
    idf = math.log(1 + (1000 - 3 + 0.5) / (3 + 0.5))
    expected = idf * 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 100 / 110))
    assert abs(bm25(2, 3, 100, 1000, 110.0) - expected) < 1e-12


def test_doc_id_is_lex_rank_of_url():
    idx = make_index(50)
    urls = sorted(idx.url_to_doc)
    for i, u in enumerate(urls):
        assert idx.url_to_doc[u] == i


def test_reference_queries_have_matches():
    idx = make_index(2000)
    for kw in ["rice", "belt", "oil", "milk", "cadbury dairy milk"]:
        res = idx.search(kw, k=10)
        assert res.total > 0, kw
        assert len(res.hits) <= 10
        # ranked by (score desc, doc_id asc)
        for (d1, s1), (d2, s2) in zip(res.hits, res.hits[1:]):
            assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_autocomplete_prefix_expands():
    idx = make_index(2000)
    # "oi" should hit oil + oiler/oily neighbors via prefix range scan
    terms = idx.expand_prefix("oi")
    assert "oil" in terms
    res_prefix = idx.search("oi", k=10)
    res_exact = idx.search("oil oil", k=10)  # multi-term path, exact terms only
    assert res_prefix.total >= res_exact.total


def test_multi_term_is_disjunctive_single_clause():
    idx = make_index(1000)
    a = idx.search("cadbury", k=10000, skip=0)
    # force exact-term path for 'cadbury' alone via expand check
    only_cadbury = idx._score_terms(["cadbury"], conjunctive=False)
    both = idx.search("cadbury dairy", k=10000)
    # disjunction: every cadbury-matching doc also matches the OR query
    assert set(only_cadbury) <= {d for d, _ in both.hits} | set()
    assert both.total >= len(only_cadbury)
    del a


def test_conjunctive_mode_intersects():
    idx = make_index(1000)
    dis = idx.search("cadbury dairy", k=10000)
    con = idx.search("cadbury dairy", k=10000, conjunctive=True)
    assert con.total <= dis.total
    con_docs = {d for d, _ in con.hits}
    cad = set(idx._score_terms(["cadbury"], False))
    dai = set(idx._score_terms(["dairy"], False))
    assert con_docs == cad & dai


def test_boosts():
    idx = make_index(1000)
    base = dict(idx.search("the", k=10000).hits)
    cb = dict(idx.search("the", k=10000, constant_boost=True).hits)
    ab = dict(idx.search("the", k=10000, avail_boost=True).hits)
    for d, s in base.items():
        assert cb[d] == s + (CONSTANT_BOOST if idx.boosted(d) else 0.0)
        assert ab[d] == s + (AVAIL_BOOST if idx.avail(d) > 0 else 0.0)
    assert any(idx.boosted(d) for d in base), "fixture must contain boosted docs"
    assert any(idx.avail(d) == 0 for d in base), "fixture must contain zero-avail docs"


def test_pagination():
    idx = make_index(1000)
    full = idx.search("the", k=30).hits
    p1 = idx.search("the", k=10, skip=0).hits
    p2 = idx.search("the", k=10, skip=10).hits
    p3 = idx.search("the", k=10, skip=20).hits
    assert p1 + p2 + p3 == full


def test_stopword_query_passthrough():
    idx = make_index(1000)
    assert idx.search("rs 10 oil", k=10).hits == idx.search("10 oil", k=10).hits
