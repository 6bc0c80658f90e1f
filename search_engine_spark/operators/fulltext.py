"""Full-text operators over the ``documents`` table, SQL-checkable.

These express the reference's Atlas-Search semantics (SURVEY.md §2.A) in
forms DuckDB can verify: term statistics, tf ranking, compound must/should
matching, prefix autocomplete, and — the flagship — Lucene-BM25 top-k where
the *actual distributed engine* (index builder + SearchEngine) is compared
against a pure-SQL BM25 oracle.  Scores are rounded to 6 decimals and ranked
on the rounded value with a doc_id tiebreak on both sides, so last-ulp libm
differences cannot flip ranks.

The BM25 SQL mirrors the engine's float expression tree operand-for-operand
(see query/engine.py:169): ``idf * tf / (tf + k1*(1 - b + b*dl/avgdl))`` with
left-associative evaluation, and doc scores sum in ascending term order.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..numerics import round_half_away
from ._common import TOKENS_SQL, ranked_topk, t, tokens_col

K1 = 1.2
B = 0.75

# --------------------------------------------------------------------------
# term statistics (the index builder's stats pass, SQL-checkable)
# --------------------------------------------------------------------------

def term_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    return (
        tok.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf"))
    )


TERM_STATS_SQL = f"""
SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents)
GROUP BY term
"""

# --------------------------------------------------------------------------
# A2: prefix autocomplete — term-dictionary range scan
# --------------------------------------------------------------------------

def prefix_terms(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    return (
        tok.filter(F.col("term").startswith("s"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


PREFIX_TERMS_SQL = f"""
SELECT term, COUNT(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents)
WHERE term LIKE 's%'
GROUP BY term
"""

# --------------------------------------------------------------------------
# tf top-k for one term (posting-list lookup, integer-exact)
# --------------------------------------------------------------------------

def tf_topk(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tf = F.size(F.filter(tokens_col(), lambda x: x == "scan"))
    scored = d.select("doc_id", tf.alias("tf")).filter(F.col("tf") > 0)
    order = [F.desc("tf"), F.asc("doc_id")]
    return ranked_topk(scored, order, 20).select("doc_id", "tf", "rk")


TF_TOPK_SQL = f"""
SELECT doc_id, tf, rk
FROM (
  SELECT doc_id, tf, row_number() OVER (ORDER BY tf DESC, doc_id ASC) AS rk
  FROM (SELECT doc_id, len(list_filter({TOKENS_SQL}, x -> x = 'scan')) AS tf
        FROM documents)
  WHERE tf > 0
) WHERE rk <= 20
"""

# --------------------------------------------------------------------------
# A3/A4/A5: compound must + should with minimumShouldMatch=1
# (reference search_utils.py:104-151) — integer-exact
# --------------------------------------------------------------------------

def must_should(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    tf_must = F.size(F.filter(toks, lambda x: x == "scan"))
    tf_s1 = F.size(F.filter(toks, lambda x: x == "window"))
    tf_s2 = F.size(F.filter(toks, lambda x: x == "merge"))
    out = d.select(
        "doc_id",
        tf_must.alias("tf_must"),
        tf_s1.alias("tf_should1"),
        tf_s2.alias("tf_should2"),
    ).filter((F.col("tf_must") > 0) & ((F.col("tf_should1") > 0) | (F.col("tf_should2") > 0)))
    return out.withColumn(
        "n_should_matched",
        (F.col("tf_should1") > 0).cast("int") + (F.col("tf_should2") > 0).cast("int"),
    )


MUST_SHOULD_SQL = f"""
SELECT doc_id, tf_must, tf_should1, tf_should2,
       CAST(tf_should1 > 0 AS INT) + CAST(tf_should2 > 0 AS INT) AS n_should_matched
FROM (
  SELECT doc_id,
         len(list_filter({TOKENS_SQL}, x -> x = 'scan')) AS tf_must,
         len(list_filter({TOKENS_SQL}, x -> x = 'window')) AS tf_should1,
         len(list_filter({TOKENS_SQL}, x -> x = 'merge')) AS tf_should2
  FROM documents
)
WHERE tf_must > 0 AND (tf_should1 > 0 OR tf_should2 > 0)
"""

# --------------------------------------------------------------------------
# BM25 top-k in pure declarative Spark (no engine) vs pure SQL
# --------------------------------------------------------------------------

_Q_TERMS = ("scan", "window")  # ascending order — scores sum in this order


def _bm25_scored(spark, sf_dir):
    """(doc_id, score rounded to 6, dl int) for the fixed 2-term query."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    base = d.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        F.size(F.filter(toks, lambda x: x == _Q_TERMS[0])).cast("double").alias("tf1"),
        F.size(F.filter(toks, lambda x: x == _Q_TERMS[1])).cast("double").alias("tf2"),
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("dl").alias("sum_dl"),
        F.count_if(F.col("tf1") > 0).cast("double").alias("df1"),
        F.count_if(F.col("tf2") > 0).cast("double").alias("df2"),
    )
    j = base.crossJoin(F.broadcast(stats)).filter((F.col("tf1") > 0) | (F.col("tf2") > 0))
    avgdl = F.col("sum_dl") / F.col("n")

    def idf(dfc):
        return F.log(F.lit(1.0) + (F.col("n") - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))

    def tscore(tf, dfc):
        return F.when(
            tf > 0,
            idf(dfc) * tf / (tf + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / avgdl)),
        ).otherwise(F.lit(0.0))

    return j.select(
        "doc_id",
        F.round(
            tscore(F.col("tf1"), F.col("df1")) + tscore(F.col("tf2"), F.col("df2")), 6
        ).alias("score"),
        F.col("dl").cast("int").alias("dli"),
    )


def _bm25_spark_df(spark, sf_dir, k=20):
    scored = _bm25_scored(spark, sf_dir)
    order = [F.desc("score"), F.asc("doc_id")]
    return ranked_topk(scored, order, k).select("doc_id", "score", "rk")


def bm25_topk(spark, sf_dir):
    return _bm25_spark_df(spark, sf_dir)


# CTE body shared by the top-k oracle and the query-log replay oracle
_BM25_CTES_TMPL = f"""base AS (
  SELECT doc_id,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS dl,
         CAST(len(list_filter({TOKENS_SQL}, x -> x = '{{t1}}')) AS DOUBLE) AS tf1,
         CAST(len(list_filter({TOKENS_SQL}, x -> x = '{{t2}}')) AS DOUBLE) AS tf2
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sum_dl,
         CAST(COUNT(*) FILTER (WHERE tf1 > 0) AS DOUBLE) AS df1,
         CAST(COUNT(*) FILTER (WHERE tf2 > 0) AS DOUBLE) AS df2
  FROM base
), scored AS (
  SELECT doc_id,
         round(
           (CASE WHEN tf1 > 0 THEN
              ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1
                / (tf1 + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n)))
            ELSE 0.0 END)
           + (CASE WHEN tf2 > 0 THEN
              ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2
                / (tf2 + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n)))
            ELSE 0.0 END), 6) AS score,
         CAST(dl AS INT) AS dli
  FROM base CROSS JOIN stats
  WHERE tf1 > 0 OR tf2 > 0
)"""

_BM25_ORACLE_TMPL = (
    "\nWITH " + _BM25_CTES_TMPL + """
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""
)

BM25_TOPK_SQL = _BM25_ORACLE_TMPL.format(t1=_Q_TERMS[0], t2=_Q_TERMS[1])

# --------------------------------------------------------------------------
# the flagship: the REAL engine (index build + SearchEngine) vs the SQL oracle
# --------------------------------------------------------------------------

_ENGINE_CACHE: dict[str, str] = {}


def _index_for(spark, sf_dir: str) -> str:
    """Build (once per sf_dir per process) an index over documents.

    Positional (``positions=True``) so the one shared index serves the
    phrase gate too; the non-phrase engine gates never read the column
    (pruned at the parquet scan).  The dir prefix changed with the layout
    so stale non-positional caches from earlier runs can't be picked up.
    """
    if sf_dir in _ENGINE_CACHE:
        return _ENGINE_CACHE[sf_dir]
    from ..index.builder import BuildConfig, build_index

    # "idxdv": positional layout + the (lang, n_chars) doc-values sidecar
    # (the single-field dv gates read it; every other gate prunes the
    # columns at the scan) — prefix changed with the layout so stale
    # pre-docvalues caches can't be picked up ("idxp" was the pre-dv one)
    index_dir = os.path.join(
        tempfile.gettempdir(), "ses_idxdv_" + sf_dir.strip("/").replace("/", "_")
    )
    marker = os.path.join(index_dir, "corpus_stats.json")  # == IndexCatalog.stats_file
    if not os.path.exists(marker):
        cfg = BuildConfig(block_docs=256, target_ranges=64, min_range_docs=256,
                          n_partitions=16, waves=2, positions=True,
                          docvalues_cols=("lang", "n_chars"))
        build_index(
            spark,
            f"{sf_dir}/documents.parquet",
            index_dir,
            cfg=cfg,
            id_col="doc_id",
        )
    _ENGINE_CACHE[sf_dir] = index_dir
    return index_dir


def _engine_page_frame(spark, res, k: int = 20, extra_cols: tuple = ()):
    """THE shared gate postlude: re-rank an engine page on the rounded score
    with the doc_id tiebreak (the oracle's rule), emit top-k with a rank.

    Every engine gate funnels through here so the ranking rule lives in
    exactly one place; ``extra_cols`` appends (name, sql_type) columns the
    specific gate carries (highlights, first_pos, ...)."""
    pdf = res.page.copy()
    pdf["score"] = round_half_away(pdf["score"], 6)
    pdf = (
        pdf.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    pdf["rk"] = range(1, len(pdf) + 1)
    names = ["doc_id", "score", "rk"] + [n for n, _ in extra_cols]
    schema = "doc_id long, score double, rk int" + "".join(
        f", {n} {t}" for n, t in extra_cols
    )
    return spark.createDataFrame(pdf[names], schema)


def _engine_topk_frame(spark, eng, k: int = 20):
    """BM25 gate form: the fixed 2-term WAND query through the postlude."""
    return _engine_page_frame(spark, eng.search(" ".join(_Q_TERMS), k=60, mode="wand"), k)


def engine_bm25_topk(spark, sf_dir):
    """Distributed engine result, re-ranked on rounded score like the oracle."""
    from ..query.engine import SearchEngine

    return _engine_topk_frame(spark, SearchEngine(spark, _index_for(spark, sf_dir)))


ENGINE_BM25_TOPK_SQL = BM25_TOPK_SQL


# --------------------------------------------------------------------------
# phrase top-k (Atlas $search.phrase): exact adjacency + BM25 over the
# phrase as one pseudo-term (tf = occurrence count, df = matching docs).
# Declarative form = posexplode self-join on (doc, pos+1); engine form =
# the positional index + SearchEngine(phrase=True). One SQL oracle gates
# both.
# --------------------------------------------------------------------------

_P_TERMS = ("table", "hash")  # adjacent bigram, df=46 at sf0.01


def phrase_topk(spark, sf_dir, k=20):
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    tok = d.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        F.posexplode(toks).alias("pos", "term"),
    )
    t0 = tok.filter(F.col("term") == _P_TERMS[0]).select("doc_id", "dl", "pos")
    t1 = tok.filter(F.col("term") == _P_TERMS[1]).select(
        F.col("doc_id").alias("doc_id1"), (F.col("pos") - 1).alias("pos0")
    )
    occ = t0.join(
        t1, (F.col("doc_id") == F.col("doc_id1")) & (F.col("pos") == F.col("pos0"))
    )
    ph = occ.groupBy("doc_id").agg(
        F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    stats = d.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.size(toks).cast("double")).alias("sum_dl"),
    )
    dfc = ph.agg(F.count("*").cast("double").alias("df"))
    j = ph.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfc))
    avgdl = F.col("sum_dl") / F.col("n")
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    score = F.round(
        idf * F.col("tf")
        / (F.col("tf") + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / avgdl)),
        6,
    )
    scored = j.select("doc_id", score.alias("score"))
    return ranked_topk(scored, [F.desc("score"), F.asc("doc_id")], k).select(
        "doc_id", "score", "rk"
    )


PHRASE_TOPK_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({TOKENS_SQL}) AS term,
         generate_subscripts({TOKENS_SQL}, 1) AS pos,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS dl
  FROM documents
), occ AS (
  SELECT t0.doc_id, t0.dl
  FROM tok t0 JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.term = '{_P_TERMS[0]}' AND t1.term = '{_P_TERMS[1]}'
), ph AS (
  SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
  FROM occ GROUP BY doc_id
), stats AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n,
         (SELECT SUM(CAST(len({TOKENS_SQL}) AS DOUBLE)) FROM documents) AS sum_dl,
         CAST(COUNT(*) AS DOUBLE) AS df
  FROM ph
), scored AS (
  SELECT doc_id,
         round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf
               / (tf + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n))), 6) AS score
  FROM ph CROSS JOIN stats
)
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


def engine_phrase_topk(spark, sf_dir, k=20):
    """The real engine's phrase path (positional index + SearchEngine)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(spark, eng.search(" ".join(_P_TERMS), k=60, phrase=True), k)


ENGINE_PHRASE_TOPK_SQL = PHRASE_TOPK_SQL


# --------------------------------------------------------------------------
# ordered proximity (Lucene Intervals "ordered NEAR with maxgaps"): like the
# phrase, but adjacent terms may be up to _NEAR_GAP extra tokens apart, terms
# strictly in order; tf = distinct last-term positions completing a chain.
# --------------------------------------------------------------------------

_NEAR_GAP = 2


def phrase_near_topk(spark, sf_dir, k=20):
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    tok = d.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        F.posexplode(toks).alias("pos", "term"),
    )
    t0 = tok.filter(F.col("term") == _P_TERMS[0]).select("doc_id", "dl", "pos")
    t1 = tok.filter(F.col("term") == _P_TERMS[1]).select(
        F.col("doc_id").alias("doc_id1"), F.col("pos").alias("pos1")
    )
    gap = F.col("pos1") - F.col("pos")
    occ = t0.join(
        t1,
        (F.col("doc_id") == F.col("doc_id1"))
        & (gap >= 1)
        & (gap <= _NEAR_GAP + 1),
    )
    ph = occ.groupBy("doc_id").agg(
        F.count_distinct("pos1").cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )
    stats = d.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.size(toks).cast("double")).alias("sum_dl"),
    )
    dfc = ph.agg(F.count("*").cast("double").alias("df"))
    j = ph.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfc))
    avgdl = F.col("sum_dl") / F.col("n")
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    score = F.round(
        idf * F.col("tf")
        / (F.col("tf") + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / avgdl)),
        6,
    )
    scored = j.select("doc_id", score.alias("score"))
    return ranked_topk(scored, [F.desc("score"), F.asc("doc_id")], k).select(
        "doc_id", "score", "rk"
    )


PHRASE_NEAR_TOPK_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({TOKENS_SQL}) AS term,
         generate_subscripts({TOKENS_SQL}, 1) AS pos,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS dl
  FROM documents
), occ AS (
  SELECT t0.doc_id, t0.dl, t1.pos AS end_pos
  FROM tok t0 JOIN tok t1 ON t1.doc_id = t0.doc_id
   AND t1.pos - t0.pos BETWEEN 1 AND {_NEAR_GAP + 1}
  WHERE t0.term = '{_P_TERMS[0]}' AND t1.term = '{_P_TERMS[1]}'
), ph AS (
  SELECT doc_id, CAST(COUNT(DISTINCT end_pos) AS DOUBLE) AS tf,
         ANY_VALUE(dl) AS dl
  FROM occ GROUP BY doc_id
), stats AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n,
         (SELECT SUM(CAST(len({TOKENS_SQL}) AS DOUBLE)) FROM documents) AS sum_dl,
         CAST(COUNT(*) AS DOUBLE) AS df
  FROM ph
), scored AS (
  SELECT doc_id,
         round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf
               / (tf + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n))), 6) AS score
  FROM ph CROSS JOIN stats
)
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


def engine_phrase_near_topk(spark, sf_dir, k=20):
    """The engine's ordered-proximity path (phrase=True, max_gap>0)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(
        spark, eng.search(" ".join(_P_TERMS), k=60, phrase=True, max_gap=_NEAR_GAP), k
    )


ENGINE_PHRASE_NEAR_TOPK_SQL = PHRASE_NEAR_TOPK_SQL


# --------------------------------------------------------------------------
# fuzzy matching (Atlas/Lucene fuzzy): the query term expands to its
# Levenshtein-<=1 dictionary neighborhood; the union scores as one
# disjunction, each variant with its own idf, summed per doc in ASCENDING
# TERM ORDER (the engine's deterministic float fold — the SQL oracle
# reproduces it with list(s ORDER BY term) + list_reduce left fold).
# --------------------------------------------------------------------------

_FZ_Q = "sow"  # expands to {row, slow} at sf0.01 — a real multi-variant fold


def fuzzy_topk(spark, sf_dir, k=20):
    return _fuzzy_disjunction_topk(
        spark, sf_dir, F.levenshtein(F.col("term"), F.lit(_FZ_Q)) <= 1, k
    )


def _fuzzy_disjunction_topk(spark, sf_dir, vocab_cond, k=20):
    """Shared declarative twin for every fuzzy surface: filter the corpus
    vocabulary with ``vocab_cond``, then score the surviving variants as one
    BM25 disjunction (per-variant idf, ascending-term float fold)."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    tok = d.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        F.explode(toks).alias("term"),
    )
    vocab = tok.select("term").distinct().filter(vocab_cond)
    per = (
        tok.join(F.broadcast(vocab), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    dfs = per.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    stats = d.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.size(toks).cast("double")).alias("sum_dl"),
    )
    avgdl = F.col("sum_dl") / F.col("n")
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    s = idf * F.col("tf") / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / avgdl)
    )
    scored_term = (
        per.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", s.alias("s"))
    )
    parts = F.sort_array(F.collect_list(F.struct("term", "s")))
    agg = scored_term.groupBy("doc_id").agg(parts.alias("parts"))
    scored = agg.select(
        "doc_id",
        F.round(
            F.aggregate("parts", F.lit(0.0), lambda a, x: a + x["s"]), 6
        ).alias("score"),
    )
    return ranked_topk(scored, [F.desc("score"), F.asc("doc_id")], k).select(
        "doc_id", "score", "rk"
    )


def _disj_topk_sql(vocab_cond: str) -> str:
    """DuckDB twin of ``_fuzzy_disjunction_topk``: filter the vocabulary
    with ``vocab_cond``, score the variants as one BM25 disjunction
    (per-variant idf, ascending-term fold) — shared by every
    term-expansion gate (fuzzy, wildcard, ...)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS term,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS dl
  FROM documents
), exp AS (
  SELECT DISTINCT term FROM tok WHERE {vocab_cond}
), per AS (
  SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf,
         ANY_VALUE(t.dl) AS dl
  FROM tok t JOIN exp USING (term) GROUP BY t.doc_id, t.term
), dfs AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM per GROUP BY term
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(len({TOKENS_SQL}) AS DOUBLE)) AS sum_dl
  FROM documents
), scored_term AS (
  SELECT per.doc_id, per.term,
         ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf
           / (tf + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n))) AS s
  FROM per JOIN dfs USING (term) CROSS JOIN stats
), agg AS (
  SELECT doc_id, list(s ORDER BY term) AS ss FROM scored_term GROUP BY doc_id
), scored AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ss),
                           (a, b) -> a + b), 6) AS score
  FROM agg
)
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


FUZZY_TOPK_SQL = _disj_topk_sql(f"levenshtein(term, '{_FZ_Q}') <= 1")


def engine_fuzzy_topk(spark, sf_dir, k=20):
    """The real engine's fuzzy path: dictionary expansion + disjunction."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(spark, eng.search(_FZ_Q, k=60, fuzzy=1), k)


ENGINE_FUZZY_TOPK_SQL = FUZZY_TOPK_SQL


# --------------------------------------------------------------------------
# wildcard matching (the Atlas/Lucene `wildcard` operator): the unanalyzed
# pattern (`*` = any run, `?` = one char) expands against the dictionary —
# fixed-prefix range scan + the shared anchored regex — and the expansion
# scores as the usual disjunction.  's?a*' -> {scan, small, spark} at
# sf0.01: a 3-variant fold exercising both metacharacters.  The DuckDB twin
# maps the pattern to LIKE ('*'->'%', '?'->'_'), exactly equivalent on the
# [0-9a-z] term alphabet wildcard_pattern_parts pins.
# --------------------------------------------------------------------------

_WC_Q = "s?a*"
_WC_LIKE = _WC_Q.replace("*", "%").replace("?", "_")


def wildcard_topk(spark, sf_dir, k=20):
    return _fuzzy_disjunction_topk(
        spark, sf_dir, F.col("term").like(_WC_LIKE), k
    )


WILDCARD_TOPK_SQL = _disj_topk_sql(f"term LIKE '{_WC_LIKE}'")


def engine_wildcard_topk(spark, sf_dir, k=20):
    """The real engine's wildcard path: prefix-bounded dictionary range
    scan + regex filter, then the shared disjunction fold."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(spark, eng.search(_WC_Q, k=60, wildcard=True), k)


ENGINE_WILDCARD_TOPK_SQL = WILDCARD_TOPK_SQL


# --------------------------------------------------------------------------
# regex matching (the Atlas/Lucene `regex` operator, wildcard's general
# form): full-term matching with the dialect-safe subset regex_pattern_parts
# pins — this gate makes the three-dialect agreement claim MEASURED: the
# Spark twin runs the pattern through Java rlike, the engine through python
# re, and the oracle through DuckDB's RE2 regexp_full_match, all three over
# the same corpus.  's(can|low)|gr.up' -> {scan, slow, group}: alternation,
# grouping, and '.' in one pattern.
# --------------------------------------------------------------------------

_RX_Q = "s(can|low)|gr.up"


def regex_topk(spark, sf_dir, k=20):
    return _fuzzy_disjunction_topk(
        spark, sf_dir, F.col("term").rlike(f"^(?:{_RX_Q})$"), k
    )


REGEX_TOPK_SQL = _disj_topk_sql(f"regexp_full_match(term, '{_RX_Q}')")


def engine_regex_topk(spark, sf_dir, k=20):
    """The real engine's regex path: prefix-bounded dictionary scan (empty
    prefix here — top-level alternation) + python-re fullmatch, then the
    shared disjunction fold."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(spark, eng.search(_RX_Q, k=60, regex=True), k)


ENGINE_REGEX_TOPK_SQL = REGEX_TOPK_SQL


# --------------------------------------------------------------------------
# MoreLikeThis (Lucene MLT / Atlas moreLikeThis): the supplied text's most
# characteristic terms — tf_text * idf, rounded to 6, term-asc tiebreak, top
# max_query_terms — searched as the standard disjunction.  The gate text
# is pre-analyzed (lowercase, space-separated) so DuckDB's string_split is
# the analyzer; repeated terms make tf matter, and max_query_terms=5 over
# ~10 candidates makes the selection cutoff real.
# --------------------------------------------------------------------------

_MLT_TEXT = "the fast scan scan window merge stream the slow data"
_MLT_MAXT = 5


def engine_mlt_topk(spark, sf_dir, k=20):
    """The real engine's MoreLikeThis: tf-idf term selection + disjunction."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    res = eng.more_like_this(_MLT_TEXT, k=60, max_query_terms=_MLT_MAXT)
    return _engine_page_frame(spark, res, k)


# the exp CTE's cond is a correlated-free subquery running the same
# selection: qtf from the literal text, df/n from the corpus, round-6
# tf*idf, top max_query_terms by (score desc, term asc)
ENGINE_MLT_TOPK_SQL = _disj_topk_sql(f"""term IN (
    SELECT term FROM (
      SELECT q.term,
             round(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6) AS sc
      FROM (SELECT u.term, CAST(COUNT(*) AS DOUBLE) AS qtf
            FROM unnest(string_split('{_MLT_TEXT}', ' ')) AS u(term)
            GROUP BY u.term) q
      JOIN (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
            FROM tok GROUP BY term) d USING (term)
      CROSS JOIN (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents) s
      ORDER BY sc DESC, q.term ASC LIMIT {_MLT_MAXT}
    )
  )""")


# --------------------------------------------------------------------------
# spelling suggestion ("did you mean"): best fuzzy neighbor by document
# frequency (df desc, term asc) — the suggestion surface a search platform
# exposes next to its fuzzy option.
# --------------------------------------------------------------------------

_SUG_QUERIES = ("scen", "hask", "sow", "tble", "qqqq")  # last has no neighbor


def engine_suggest(spark, sf_dir):
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    rows = [
        (qt, sug)
        for qt in _SUG_QUERIES
        if (sug := eng.suggest(qt, fuzzy=1)) is not None
    ]
    return spark.createDataFrame(rows, "qterm string, suggestion string")


ENGINE_SUGGEST_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents
), vocab AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
), q(qterm) AS (
  VALUES {", ".join(f"('{t}')" for t in _SUG_QUERIES)}
), cand AS (
  SELECT q.qterm, v.term, v.df,
         row_number() OVER (PARTITION BY q.qterm
                            ORDER BY v.df DESC, v.term ASC) AS rk
  FROM q JOIN vocab v ON levenshtein(v.term, q.qterm) <= 1
)
SELECT qterm, term AS suggestion FROM cand WHERE rk = 1
"""


# --------------------------------------------------------------------------
# Damerau fuzzy (Lucene fuzzy with transpositions=true — the Atlas DEFAULT
# the reference's $search fuzzy option inherits): an adjacent transposition
# counts as ONE edit, so classic swap typos ('tabel', 'jion', 'teh') reach
# their corrections.  At max_edits=1 the exact closed form every JVM engine
# can compute is  levenshtein(t, q) <= 1  OR  t IN swap_variants(q)  — and
# DuckDB's damerau_levenshtein states the same set directly (at k=1 OSA and
# unrestricted Damerau coincide; property-pinned in tests/test_damerau.py).
# Two query terms so the expansion is a REAL multi-variant disjunction fold
# ({table, join} at sf0.01), and plain Levenshtein expands BOTH to {} — the
# gate distinguishes the semantics, not just re-tests the fuzzy pipeline.
# --------------------------------------------------------------------------

_DZ_QS = ("tabel", "jion")  # corrections reachable only via a transposition


def _damerau1_cond_spark(q: str):
    from ..analysis.text import swap_variants

    cond = F.levenshtein(F.col("term"), F.lit(q)) <= 1
    swaps = swap_variants(q)
    if swaps:
        cond = cond | F.col("term").isin(swaps)
    return cond


def damerau_topk(spark, sf_dir, k=20):
    cond = _damerau1_cond_spark(_DZ_QS[0])
    for q in _DZ_QS[1:]:
        cond = cond | _damerau1_cond_spark(q)
    return _fuzzy_disjunction_topk(spark, sf_dir, cond, k)


def _replace_exactly(sql: str, needle: str, repl: str) -> str:
    """str.replace that REFUSES to no-op: a reworded FUZZY_TOPK_SQL filter
    must break oracle construction loudly, not silently leave the derived
    oracle running the plain-fuzzy query."""
    if needle not in sql:
        raise AssertionError(f"oracle template lost its filter anchor: {needle!r}")
    return sql.replace(needle, repl)


DAMERAU_TOPK_SQL = _replace_exactly(
    FUZZY_TOPK_SQL,
    f"levenshtein(term, '{_FZ_Q}') <= 1",
    " OR ".join(f"damerau_levenshtein(term, '{q}') <= 1" for q in _DZ_QS),
)


def engine_damerau_topk(spark, sf_dir, k=20):
    """The real engine's transposition-aware fuzzy path."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(
        spark,
        eng.search(" ".join(_DZ_QS), k=60, fuzzy=1, fuzzy_transpositions=True),
        k,
    )


ENGINE_DAMERAU_TOPK_SQL = DAMERAU_TOPK_SQL


_SUG_DZ_QUERIES = ("teh", "tabel", "sow", "qqqq")  # teh/tabel need the swap


def engine_suggest_damerau(spark, sf_dir):
    """"Did you mean" with transpositions: 'teh' -> 'the' is distance 1 here
    (plain Levenshtein calls it 2 and suggests nothing)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    rows = [
        (qt, sug)
        for qt in _SUG_DZ_QUERIES
        if (sug := eng.suggest(qt, fuzzy=1, transpositions=True)) is not None
    ]
    return spark.createDataFrame(rows, "qterm string, suggestion string")


ENGINE_SUGGEST_DAMERAU_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents
), vocab AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
), q(qterm) AS (
  VALUES {", ".join(f"('{t}')" for t in _SUG_DZ_QUERIES)}
), cand AS (
  SELECT q.qterm, v.term, v.df,
         row_number() OVER (PARTITION BY q.qterm
                            ORDER BY v.df DESC, v.term ASC) AS rk
  FROM q JOIN vocab v ON damerau_levenshtein(v.term, q.qterm) <= 1
)
SELECT qterm, term AS suggestion FROM cand WHERE rk = 1
"""


# --------------------------------------------------------------------------
# phonetic matching (SURVEY §2 A11 — the reference's commented-out
# "sounds_like" pipeline, reference metaphone.py:37-47, computed
# doublemetaphone keys per name word for phonetic $search).  Re-expressed
# Spark-first: every analyzed query term expands to the dictionary terms
# sharing its pinned Soundex key, and the union scores as the standard BM25
# disjunction.  The key is ONE definition in three stacks: python
# (analysis.text.soundex_key), Spark columns (query.engine.soundex_key_col),
# and the DuckDB chain below — translate -> adjacent-dedup -> drop the first
# code -> drop zeros -> pad/cut to 3.
# --------------------------------------------------------------------------

_PH_QS = ("grup", "stremm")  # keys G610/S365 -> {group, stream} at sf0.01


def _soundex_sql(operand: str) -> str:
    """The pinned Soundex chain as a DuckDB expression over ``operand``.

    DuckDB's regex engine is RE2, which SILENTLY ignores backreferences —
    ``regexp_replace(x, '(.)\\1+', '\\1', 'g')`` returns x unchanged — so
    the adjacent-duplicate collapse is spelled as one literal-run replace
    per code digit (the code alphabet is exactly 0-6).  Pinned against the
    python/Spark forms on dedup-requiring terms in tests/test_phonetic.py.
    """
    from ..analysis.text import _SOUNDEX_MAP

    dedup = f"translate({operand}, 'abcdefghijklmnopqrstuvwxyz', '{_SOUNDEX_MAP}')"
    for d in sorted(set(_SOUNDEX_MAP)):
        dedup = f"regexp_replace({dedup}, '{d}{d}+', '{d}', 'g')"
    key = (
        f"upper(({operand})[1]) || substr(rpad(replace(substr({dedup}, 2), "
        f"'0', ''), 3, '0'), 1, 3)"
    )
    return (
        f"CASE WHEN NOT regexp_matches({operand}, '^[a-z]+$') "
        f"THEN {operand} ELSE {key} END"
    )


def phonetic_topk(spark, sf_dir, k=20):
    from ..analysis.text import soundex_key
    from ..query.engine import soundex_key_col

    keys = sorted({soundex_key(q) for q in _PH_QS})
    return _fuzzy_disjunction_topk(
        spark, sf_dir, soundex_key_col(F.col("term")).isin(keys), k
    )


PHONETIC_TOPK_SQL = _replace_exactly(
    FUZZY_TOPK_SQL,
    f"levenshtein(term, '{_FZ_Q}') <= 1",
    f"{_soundex_sql('term')} IN ("
    + ", ".join(_soundex_sql(f"'{q}'") for q in _PH_QS)
    + ")",
)


def engine_phonetic_topk(spark, sf_dir, k=20):
    """The real engine's phonetic path: key-equal expansion + disjunction."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(
        spark, eng.search(" ".join(_PH_QS), k=60, phonetic=True), k
    )


ENGINE_PHONETIC_TOPK_SQL = PHONETIC_TOPK_SQL


# --------------------------------------------------------------------------
# fuzzy autocomplete (Atlas autocomplete + fuzzy option, the reference's
# retail should-clauses use autocomplete paths, search_utils.py:182-186):
# expansion = dictionary terms having a PREFIX within Levenshtein distance 1
# of the query term.  Closed form every engine shares:
#   min over L in [len(q)-1, len(q)+1] of levenshtein(t[:L], q) <= 1
# The union scores as one disjunction (per-variant idf, ascending-term fold)
# exactly like the plain-fuzzy path.
# --------------------------------------------------------------------------

_PF_Q = "scen"  # prefix-edit-1 neighborhood at sf0.01 spans scan/scene-like stems


def _pf_vocab_cond_spark(q: str, fuzzy: int = 1):
    lq = len(q)
    exprs = [
        F.levenshtein(F.substring("term", 1, L), F.lit(q))
        for L in range(max(1, lq - fuzzy), lq + fuzzy + 1)
    ]
    return (F.least(*exprs) if len(exprs) > 1 else exprs[0]) <= fuzzy


def _pf_vocab_cond_sql(q: str, fuzzy: int = 1) -> str:
    lq = len(q)
    parts = ", ".join(
        f"levenshtein(substr(term, 1, {L}), '{q}')"
        for L in range(max(1, lq - fuzzy), lq + fuzzy + 1)
    )
    return f"least({parts}) <= {fuzzy}"


def prefix_fuzzy_topk(spark, sf_dir, k=20):
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    tok = d.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        F.explode(toks).alias("term"),
    )
    vocab = tok.select("term").distinct().filter(_pf_vocab_cond_spark(_PF_Q))
    per = (
        tok.join(F.broadcast(vocab), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    dfs = per.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    stats = d.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.size(toks).cast("double")).alias("sum_dl"),
    )
    avgdl = F.col("sum_dl") / F.col("n")
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    s = idf * F.col("tf") / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / avgdl)
    )
    scored_term = (
        per.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", s.alias("s"))
    )
    parts = F.sort_array(F.collect_list(F.struct("term", "s")))
    agg = scored_term.groupBy("doc_id").agg(parts.alias("parts"))
    scored = agg.select(
        "doc_id",
        F.round(
            F.aggregate("parts", F.lit(0.0), lambda a, x: a + x["s"]), 6
        ).alias("score"),
    )
    return ranked_topk(scored, [F.desc("score"), F.asc("doc_id")], k).select(
        "doc_id", "score", "rk"
    )


PREFIX_FUZZY_TOPK_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS term,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS dl
  FROM documents
), exp AS (
  SELECT DISTINCT term FROM tok WHERE {_pf_vocab_cond_sql(_PF_Q)}
), per AS (
  SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf,
         ANY_VALUE(t.dl) AS dl
  FROM tok t JOIN exp USING (term) GROUP BY t.doc_id, t.term
), dfs AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM per GROUP BY term
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(len({TOKENS_SQL}) AS DOUBLE)) AS sum_dl
  FROM documents
), scored_term AS (
  SELECT per.doc_id, per.term,
         ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf
           / (tf + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n))) AS s
  FROM per JOIN dfs USING (term) CROSS JOIN stats
), agg AS (
  SELECT doc_id, list(s ORDER BY term) AS ss FROM scored_term GROUP BY doc_id
), scored AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ss),
                           (a, b) -> a + b), 6) AS score
  FROM agg
)
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


def engine_prefix_fuzzy_topk(spark, sf_dir, k=20):
    """The real engine's fuzzy-autocomplete path (prefix_fuzzy=1)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(spark, eng.search(_PF_Q, k=60, prefix_fuzzy=1), k)


ENGINE_PREFIX_FUZZY_TOPK_SQL = PREFIX_FUZZY_TOPK_SQL


# --------------------------------------------------------------------------
# highlighting (Atlas $search highlight): first-occurrence offsets for the
# PAGE docs only — ranking first, then k docs' blocks decode positions.
# The deterministic "term@pos ..." string (terms ascending, absent terms
# omitted) is reproducible byte-for-byte by the SQL oracle.
# --------------------------------------------------------------------------


def engine_highlight_topk(spark, sf_dir, k=20):
    """BM25 top-k through the real engine with highlight=True: each page
    row carries the matched terms' first token offsets."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(
        spark,
        eng.search(" ".join(_Q_TERMS), k=60, mode="wand", highlight=True),
        k,
        extra_cols=(("highlights", "string"),),
    )


ENGINE_HIGHLIGHT_TOPK_SQL = (
    "\nWITH " + _BM25_CTES_TMPL + f""", hl AS (
  SELECT doc_id,
         concat_ws(' ',
           CASE WHEN p1 > 0 THEN '{{t1}}@' || CAST(p1 - 1 AS VARCHAR) END,
           CASE WHEN p2 > 0 THEN '{{t2}}@' || CAST(p2 - 1 AS VARCHAR) END
         ) AS highlights
  FROM (SELECT doc_id,
               list_position({TOKENS_SQL}, '{{t1}}') AS p1,
               list_position({TOKENS_SQL}, '{{t2}}') AS p2
        FROM documents)
)
SELECT r.doc_id, r.score, r.rk, hl.highlights
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored) r JOIN hl USING (doc_id)
WHERE r.rk <= 20
"""
).format(t1=_Q_TERMS[0], t2=_Q_TERMS[1])


def engine_phrase_first_pos(spark, sf_dir, k=20):
    """Phrase top-k with first_pos: each hit's first phrase-start offset."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    return _engine_page_frame(
        spark,
        eng.search(" ".join(_P_TERMS), k=60, phrase=True, highlight=True),
        k,
        extra_cols=(("first_pos", "long"),),
    )


ENGINE_PHRASE_FIRST_POS_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({TOKENS_SQL}) AS term,
         generate_subscripts({TOKENS_SQL}, 1) AS pos,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS dl
  FROM documents
), occ AS (
  SELECT t0.doc_id, t0.dl, t0.pos
  FROM tok t0 JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.term = '{_P_TERMS[0]}' AND t1.term = '{_P_TERMS[1]}'
), ph AS (
  SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl,
         MIN(pos) - 1 AS first_pos
  FROM occ GROUP BY doc_id
), stats AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n,
         (SELECT SUM(CAST(len({TOKENS_SQL}) AS DOUBLE)) FROM documents) AS sum_dl,
         CAST(COUNT(*) AS DOUBLE) AS df
  FROM ph
), scored AS (
  SELECT doc_id,
         round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf
               / (tf + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n))), 6) AS score,
         CAST(first_pos AS BIGINT) AS first_pos
  FROM ph CROSS JOIN stats
)
SELECT doc_id, score, rk, first_pos
FROM (SELECT doc_id, score, first_pos,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


# --------------------------------------------------------------------------
# streaming incremental ingest (C2 as Structured Streaming): the documents
# table arrives as three micro-batch generations (streaming/ingest.py), the
# engine queries the merged generations, and the SAME batch BM25 SQL oracle
# must hash-match — incremental ingest is invisible to query results.
# --------------------------------------------------------------------------

_STREAM_INDEX_CACHE: dict[str, str] = {}


def _stream_index_for(spark, sf_dir: str) -> str:
    """Ingest documents (once per sf_dir per process) as 3 generations."""
    if sf_dir in _STREAM_INDEX_CACHE:
        return _STREAM_INDEX_CACHE[sf_dir]
    from ..index.builder import BuildConfig
    from ..streaming.ingest import ingest_batch

    index_dir = os.path.join(
        tempfile.gettempdir(), "ses_sidx_" + sf_dir.strip("/").replace("/", "_")
    )
    marker = os.path.join(index_dir, "gen_stats", "gen=2", "_SUCCESS")
    if not os.path.exists(marker):
        docs = t(spark, sf_dir, "documents")
        hi = docs.agg(F.max("doc_id")).collect()[0][0]
        cut1, cut2 = hi // 3, 2 * hi // 3
        cfg = BuildConfig(block_docs=256, target_ranges=64, min_range_docs=256,
                          n_partitions=16)
        n_docs = docs.count()
        for e, cond in enumerate(
            [
                F.col("doc_id") <= cut1,
                (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
                F.col("doc_id") > cut2,
            ]
        ):
            ingest_batch(
                spark, docs.filter(cond), index_dir, e,
                cfg=cfg, id_col="doc_id", expected_docs=n_docs,
            )
    _STREAM_INDEX_CACHE[sf_dir] = index_dir
    return index_dir


def stream_ingest_topk(spark, sf_dir):
    """Engine top-k over the 3-generation incremental index vs the batch oracle."""
    from ..query.engine import SearchEngine

    return _engine_topk_frame(
        spark, SearchEngine(spark, _stream_index_for(spark, sf_dir))
    )


STREAM_INGEST_TOPK_SQL = BM25_TOPK_SQL


def compacted_topk(spark, sf_dir):
    """Compact the 3-generation incremental index (Lucene merge analog,
    index/compact.py: decode blocks -> re-key -> re-encode with current
    avgdl, no corpus text touched) and query it — the SAME batch BM25 SQL
    oracle must still hash-match, and the bound scale is back to 1."""
    from ..index.compact import compact_index
    from ..query.engine import SearchEngine

    src = _stream_index_for(spark, sf_dir)
    index_dir = os.path.join(
        tempfile.gettempdir(), "ses_cidx_" + sf_dir.strip("/").replace("/", "_")
    )
    if not os.path.exists(os.path.join(index_dir, "corpus_stats.json")):
        compact_index(spark, src, index_dir)
    eng = SearchEngine(spark, index_dir)
    assert eng.bound_scale == 1.0
    return _engine_topk_frame(spark, eng)


COMPACTED_TOPK_SQL = BM25_TOPK_SQL

# --------------------------------------------------------------------------
# grouped search rollup (reference /v2/search and /retail/v1/search,
# app.py:488-520, pipelines.py:484-661: score -> group by g_id -> $first
# score per group -> rank groups) — as a declarative plan AND through the
# engine's group_by= path, both against the same SQL oracle.
# --------------------------------------------------------------------------

_GROUP_MOD = 53  # == query.engine.GROUP_MOD / oracle.GROUP_MOD


def grouped_topk(spark, sf_dir, k=10):
    from pyspark.sql import Window

    g = _bm25_scored(spark, sf_dir).withColumn(
        "g_id", F.pmod(F.col("dli"), F.lit(_GROUP_MOD)).cast("int")
    )
    w = Window.partitionBy("g_id").orderBy(F.desc("score"), F.asc("doc_id"))
    best = g.withColumn("rn", F.row_number().over(w))
    counts = g.groupBy("g_id").agg(F.count("*").alias("n_docs"))
    top = (
        best.filter(F.col("rn") == 1)
        .select("g_id", F.col("doc_id").alias("top_doc"), "score")
        .join(counts, "g_id")
    )
    order = [F.desc("score"), F.asc("top_doc")]
    return ranked_topk(top, order, k).select("g_id", "top_doc", "score", "n_docs", "rk")


def engine_grouped_topk(spark, sf_dir, k=10):
    """The engine's group_by= path vs the same SQL oracle."""
    from ..query.engine import SearchEngine

    index_dir = _index_for(spark, sf_dir)
    eng = SearchEngine(spark, index_dir)
    res = eng.search(" ".join(_Q_TERMS), k=k, group_by=True)
    pdf = res.page.copy()
    pdf["score"] = round_half_away(pdf["score"], 6)
    pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    pdf = pdf.head(k)
    pdf["rk"] = range(1, len(pdf) + 1)
    pdf = pdf.rename(columns={"doc_id": "top_doc"})
    return spark.createDataFrame(
        pdf[["g_id", "top_doc", "score", "n_docs", "rk"]],
        "g_id int, top_doc long, score double, n_docs long, rk int",
    )


GROUPED_TOPK_SQL = (
    "\nWITH " + _BM25_CTES_TMPL.format(t1=_Q_TERMS[0], t2=_Q_TERMS[1]) + f""",
g AS (SELECT doc_id, score, dli % {_GROUP_MOD} AS g_id FROM scored),
best AS (
  SELECT g_id, doc_id, score,
         row_number() OVER (PARTITION BY g_id ORDER BY score DESC, doc_id ASC) AS rn
  FROM g
), agg AS (SELECT g_id, COUNT(*) AS n_docs FROM g GROUP BY g_id)
SELECT CAST(g_id AS INT) AS g_id, top_doc, score, n_docs, rk
FROM (
  SELECT b.g_id, b.doc_id AS top_doc, b.score, a.n_docs,
         row_number() OVER (ORDER BY b.score DESC, b.doc_id ASC) AS rk
  FROM best b JOIN agg a USING (g_id)
  WHERE b.rn = 1
) WHERE rk <= 10
"""
)

# --------------------------------------------------------------------------
# multi-field index paths (reference Lucene fields: should over name+barcode
# for single-term queries, must over store_id/wh_id + name otherwise,
# minimumShouldMatch=1 — search_utils.py:79-97,181-203, app.py:472-486).
# The gate corpus derives two fields from documents.text deterministically:
# title = the first 8 analyzed tokens, body = the rest — so per-field df and
# avgdl genuinely differ (at sf0.01: df_title(scan)=121 vs df_body(scan)=365)
# and the SQL oracle can recompute everything from the parquet table.
# --------------------------------------------------------------------------

_MF_TITLE_LEN = 8
_MF_Q = "scan"              # the should-over-both-fields flagship term
_MF_MUST = ("window", "scan")  # must title:window + should body:scan (retail shape)


def _mf_fields_df(spark, sf_dir):
    """(doc_id, title array, body array) — the derived two-field view."""
    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens_col().alias("toks"))
    return base.select(
        "doc_id",
        F.slice("toks", 1, _MF_TITLE_LEN).alias("title"),
        F.expr(
            f"slice(toks, {_MF_TITLE_LEN + 1}, "
            f"greatest(size(toks) - {_MF_TITLE_LEN}, 0))"
        ).alias("body"),
    )


def _mf_scored(spark, sf_dir, title_term: str, body_term: str, require_both: bool):
    """(doc_id, score) per-field BM25: body clause + title clause, body first
    (ascending posting-key fold order — 'body' < 'title')."""
    fdoc = _mf_fields_df(spark, sf_dir).select(
        "doc_id",
        F.size("title").cast("double").alias("dlt"),
        F.size("body").cast("double").alias("dlb"),
        F.size(F.filter("title", lambda x: x == title_term)).cast("double").alias("tft"),
        F.size(F.filter("body", lambda x: x == body_term)).cast("double").alias("tfb"),
    )
    stats = fdoc.agg(
        F.count_if(F.col("dlt") > 0).cast("double").alias("dct"),
        F.count_if(F.col("dlb") > 0).cast("double").alias("dcb"),
        F.sum(F.when(F.col("dlt") > 0, F.col("dlt"))).alias("sumt"),
        F.sum(F.when(F.col("dlb") > 0, F.col("dlb"))).alias("sumb"),
        F.count_if(F.col("tft") > 0).cast("double").alias("dft"),
        F.count_if(F.col("tfb") > 0).cast("double").alias("dfb"),
    )
    cond = (
        (F.col("tft") > 0) & (F.col("tfb") > 0)
        if require_both
        else (F.col("tft") > 0) | (F.col("tfb") > 0)
    )
    j = fdoc.crossJoin(F.broadcast(stats)).filter(cond)

    def sc(tf, dl, dc, dfc, sm):
        idf = F.log(F.lit(1.0) + (dc - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
        return F.when(
            tf > 0,
            idf * tf
            / (tf + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * dl / (sm / dc))),
        ).otherwise(F.lit(0.0))

    score = F.round(
        sc(F.col("tfb"), F.col("dlb"), F.col("dcb"), F.col("dfb"), F.col("sumb"))
        + sc(F.col("tft"), F.col("dlt"), F.col("dct"), F.col("dft"), F.col("sumt")),
        6,
    )
    return j.select("doc_id", score.alias("score"))


def multifield_topk(spark, sf_dir, k=20):
    """Declarative twin of the reference's single-term flagship: should over
    (title, body) with each clause scored against ITS field's df/docCount/
    avgdl, minimumShouldMatch=1."""
    scored = _mf_scored(spark, sf_dir, _MF_Q, _MF_Q, require_both=False)
    return ranked_topk(scored, [F.desc("score"), F.asc("doc_id")], k).select(
        "doc_id", "score", "rk"
    )


_MF_CTES_TMPL = f"""t AS (
  SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
), fdoc AS (
  SELECT doc_id,
         CAST(len(toks[1:{_MF_TITLE_LEN}]) AS DOUBLE) AS dlt,
         CAST(len(toks[{_MF_TITLE_LEN + 1}:]) AS DOUBLE) AS dlb,
         CAST(len(list_filter(toks[1:{_MF_TITLE_LEN}], x -> x = '{{tt}}')) AS DOUBLE) AS tft,
         CAST(len(list_filter(toks[{_MF_TITLE_LEN + 1}:], x -> x = '{{tb}}')) AS DOUBLE) AS tfb
  FROM t
), stats AS (
  SELECT CAST(COUNT(*) FILTER (WHERE dlt > 0) AS DOUBLE) AS dct,
         CAST(COUNT(*) FILTER (WHERE dlb > 0) AS DOUBLE) AS dcb,
         SUM(dlt) FILTER (WHERE dlt > 0) AS sumt,
         SUM(dlb) FILTER (WHERE dlb > 0) AS sumb,
         CAST(COUNT(*) FILTER (WHERE tft > 0) AS DOUBLE) AS dft,
         CAST(COUNT(*) FILTER (WHERE tfb > 0) AS DOUBLE) AS dfb
  FROM fdoc
), scored AS (
  SELECT doc_id,
         round(
           (CASE WHEN tfb > 0 THEN
              {{bb}} * ln(1.0 + (dcb - dfb + 0.5) / (dfb + 0.5)) * tfb
                / (tfb + {K1} * (1.0 - {B} + {B} * dlb / (sumb / dcb)))
            ELSE 0.0 END)
           + (CASE WHEN tft > 0 THEN
              {{bt}} * ln(1.0 + (dct - dft + 0.5) / (dft + 0.5)) * tft
                / (tft + {K1} * (1.0 - {B} + {B} * dlt / (sumt / dct)))
            ELSE 0.0 END), 6) AS score
  FROM fdoc CROSS JOIN stats
  WHERE {{cond}}
)"""

_MF_TOPK_SQL_TMPL = (
    "\nWITH " + _MF_CTES_TMPL + """
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""
)

MULTIFIELD_TOPK_SQL = _MF_TOPK_SQL_TMPL.format(
    tt=_MF_Q, tb=_MF_Q, cond="tft > 0 OR tfb > 0", bt="1.0", bb="1.0"
)

_MF_ENGINE_CACHE: dict[str, str] = {}


def _mf_index_for(spark, sf_dir: str) -> str:
    """Write the derived (doc_id, title, body) corpus and build the
    multi-field index over it (once per sf_dir per process)."""
    if sf_dir in _MF_ENGINE_CACHE:
        return _MF_ENGINE_CACHE[sf_dir]
    from ..index.builder import BuildConfig, build_index

    tag = sf_dir.strip("/").replace("/", "_")
    corpus_dir = os.path.join(tempfile.gettempdir(), "ses_mfcorpdv_" + tag)
    # "mfidxdv": positional multi-field layout with the (lang, n_chars)
    # doc-values sidecar (the dv-filter gate reads it; every other mf gate
    # prunes the columns at the scan) — the dir prefix changes with the
    # layout so stale pre-docvalues caches from earlier runs can't be
    # picked up ("mfidxp" was the pre-docvalues positional layout)
    index_dir = os.path.join(tempfile.gettempdir(), "ses_mfidxdv_" + tag)
    if not os.path.exists(os.path.join(index_dir, "corpus_stats.json")):
        (
            _mf_fields_df(spark, sf_dir)
            .select(
                "doc_id",
                F.array_join("title", " ").alias("title"),
                F.array_join("body", " ").alias("body"),
            )
            .join(
                t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars"),
                "doc_id",
            )
            .write.mode("overwrite")
            .parquet(corpus_dir)
        )
        cfg = BuildConfig(
            block_docs=256, target_ranges=64, min_range_docs=256,
            n_partitions=16, waves=2, field_cols=("title", "body"),
            positions=True, docvalues_cols=("lang", "n_chars"),
        )
        build_index(spark, corpus_dir, index_dir, cfg=cfg, id_col="doc_id")
    _MF_ENGINE_CACHE[sf_dir] = index_dir
    return index_dir


def engine_multifield_topk(spark, sf_dir, k=20):
    """The real engine's compound path: should over (title, body)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        should=[("title", _MF_Q), ("body", _MF_Q)], minimum_should_match=1, k=60
    )
    return _engine_page_frame(spark, res, k)


ENGINE_MULTIFIELD_TOPK_SQL = MULTIFIELD_TOPK_SQL


def engine_multifield_must(spark, sf_dir, k=20):
    """The retail compound shape (search_utils.py:181-203): must
    title:<term> + should body:<term> with minimumShouldMatch=1 — i.e. both
    clauses required, each scored against its own field stats.  Runs
    force_distributed so the driver verifies the distributed clause kernel."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        must=[("title", _MF_MUST[0])],
        should=[("body", _MF_MUST[1])],
        minimum_should_match=1,
        k=60,
        force_distributed=True,
    )
    return _engine_page_frame(spark, res, k)


ENGINE_MULTIFIELD_MUST_SQL = _MF_TOPK_SQL_TMPL.format(
    tt=_MF_MUST[0], tb=_MF_MUST[1], cond="tft > 0 AND tfb > 0", bt="1.0", bb="1.0"
)


def engine_multifield_mustnot(spark, sf_dir, k=20):
    """Lucene MUST_NOT / Atlas compound.mustNot through the real engine:
    must title:<term>, mustNot body:<term> — docs holding the excluded key
    are dropped and the excluded clause scores NOTHING (the kept docs'
    scores are the title clause's alone).  Runs force_distributed so the
    driver verifies the distributed exclusion kernel (the JVM ~arrays_overlap
    filter over the per-doc matched-key set)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        must=[("title", _MF_MUST[0])],
        must_not=[("body", _MF_MUST[1])],
        k=60,
        force_distributed=True,
    )
    return _engine_page_frame(spark, res, k)


# kept docs have tfb = 0, so the body CASE contributes exactly 0.0 — the
# template's two-clause sum is the mustNot score by construction
ENGINE_MULTIFIELD_MUSTNOT_SQL = _MF_TOPK_SQL_TMPL.format(
    tt=_MF_MUST[0], tb=_MF_MUST[1], cond="tft > 0 AND tfb = 0", bt="1.0", bb="1.0"
)

def engine_multifield_filter(spark, sf_dir, k=20):
    """Lucene FILTER / Atlas compound.filter through the real engine:
    filter title:<term> + should body:<term> with msm=0 — the filter clause
    gates matching exactly like must but scores NOTHING, so the kept doc
    set equals the must+should gate's while every score is the body
    clause's alone."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        filter=[("title", _MF_MUST[0])],
        should=[("body", _MF_MUST[1])],
        minimum_should_match=0,
        k=60,
    )
    return _engine_page_frame(spark, res, k)


# bt=0.0 zeroes the title CASE exactly like the engine's weight-0 fold
ENGINE_MULTIFIELD_FILTER_SQL = _MF_TOPK_SQL_TMPL.format(
    tt=_MF_MUST[0], tb=_MF_MUST[1], cond="tft > 0", bt="0.0", bb="1.0"
)

_MF_BOOST = 3.0


def engine_multifield_boost(spark, sf_dir, k=20):
    """Per-clause boost (Atlas ``score: {boost: {value: 3}}`` on a compound
    clause): should over (title^3, body) — the title clause's contribution
    is tripled by folding the boost into its keys' idf, so every physical
    path scores identically with no special cases."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        should=[
            {"field": "title", "query": _MF_Q, "boost": _MF_BOOST},
            ("body", _MF_Q),
        ],
        minimum_should_match=1,
        k=60,
    )
    return _engine_page_frame(spark, res, k)


ENGINE_MULTIFIELD_BOOST_SQL = _MF_TOPK_SQL_TMPL.format(
    tt=_MF_Q, tb=_MF_Q, cond="tft > 0 OR tfb > 0", bt=repr(_MF_BOOST), bb="1.0"
)


# fuzzy clause over a named path (the Atlas text clause's fuzzy option):
# body:'sow'~1 expands FIELD-SCOPED to {row, slow}, scored per-variant with
# the BODY's df/docCount/avgdl and folded in ascending posting-key order.
_MF_FZ_Q = "sow"


def engine_multifield_fuzzy(spark, sf_dir, k=20):
    """The engine's field-scoped fuzzy expansion through the compound path."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        should=[{"field": "body", "query": _MF_FZ_Q, "kind": "fuzzy", "fuzzy": 1}],
        minimum_should_match=1, k=60,
    )
    return _engine_page_frame(spark, res, k)


ENGINE_MULTIFIELD_FUZZY_SQL = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
), fdoc AS (
  SELECT doc_id, toks[{_MF_TITLE_LEN + 1}:] AS body FROM t
), tok AS (
  SELECT doc_id, CAST(len(body) AS DOUBLE) AS dl, unnest(body) AS term
  FROM fdoc
), exp AS (
  SELECT DISTINCT term FROM tok WHERE levenshtein(term, '{_MF_FZ_Q}') <= 1
), per AS (
  SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf,
         ANY_VALUE(t.dl) AS dl
  FROM tok t JOIN exp USING (term) GROUP BY t.doc_id, t.term
), dfs AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM per GROUP BY term
), stats AS (
  SELECT CAST(COUNT(*) FILTER (WHERE len(body) > 0) AS DOUBLE) AS dc,
         SUM(CAST(len(body) AS DOUBLE)) FILTER (WHERE len(body) > 0) AS sumdl
  FROM fdoc
), scored_term AS (
  SELECT per.doc_id, per.term,
         ln(1.0 + (dc - df + 0.5) / (df + 0.5)) * tf
           / (tf + {K1} * (1.0 - {B} + {B} * dl / (sumdl / dc))) AS s
  FROM per JOIN dfs USING (term) CROSS JOIN stats
), agg AS (
  SELECT doc_id, list(s ORDER BY term) AS ss FROM scored_term GROUP BY doc_id
), scored AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ss),
                           (a, b) -> a + b), 6) AS score
  FROM agg
)
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


# field-scoped phrase (the Atlas phrase clause's path option): the analyzed
# token sequence must appear consecutively WITHIN the field; the match
# scores as one pseudo-term with the FIELD's docCount/avgdl (Lucene
# per-field norms).  Positions in a field_cols build are offsets in the
# field's own token stream, so adjacency is field-local by construction.
_MF_PH_Q = "part filter"  # 42 body-adjacent docs at sf0.01


def engine_multifield_phrase(spark, sf_dir, k=20):
    """The engine's field-scoped phrase path over the positional mf index."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_field_phrase("body", _MF_PH_Q, k=60)
    return _engine_page_frame(spark, res, k)


_MF_PH_T1, _MF_PH_T2 = _MF_PH_Q.split()

ENGINE_MULTIFIELD_PHRASE_SQL = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
), fdoc AS (
  SELECT doc_id, toks[{_MF_TITLE_LEN + 1}:] AS body FROM t
), stats AS (
  SELECT CAST(COUNT(*) FILTER (WHERE len(body) > 0) AS DOUBLE) AS dc,
         SUM(CAST(len(body) AS DOUBLE)) FILTER (WHERE len(body) > 0) AS sumdl
  FROM fdoc
), per AS (
  SELECT doc_id, CAST(len(body) AS DOUBLE) AS dl,
         CAST(len(list_filter(range(1, len(body)),
                              i -> body[i] = '{_MF_PH_T1}'
                               AND body[i + 1] = '{_MF_PH_T2}')) AS DOUBLE) AS tf
  FROM fdoc WHERE len(body) >= 2
), m AS (
  SELECT doc_id, dl, tf FROM per WHERE tf > 0
), dfp AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS df FROM m
), scored AS (
  SELECT doc_id,
         round(ln(1.0 + (dc - df + 0.5) / (df + 0.5)) * tf
                 / (tf + {K1} * (1.0 - {B} + {B} * dl / (sumdl / dc))), 6)
           AS score
  FROM m CROSS JOIN dfp CROSS JOIN stats
)
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


# --------------------------------------------------------------------------
# Doc-values range/equals filter clauses (Atlas compound.filter operators
# beyond text; Lucene FILTER occur + DocValues column-stride storage).  The
# build bakes per-doc attribute columns (lang, n_chars) onto the doc_stats
# sidecar via BuildConfig(docvalues_cols=...); the engine evaluates the
# clauses as a predicate-pushed doc_stats scan semi-joined with the
# term-driven candidates — required, scoring nothing, BEFORE pagination.
# --------------------------------------------------------------------------

_DV_LANG = "en"
_DV_LO, _DV_HI = 150, 400  # n_chars band: 111 of 500 sf0.01 docs pass


def mf_dv_filter_topk(spark, sf_dir, k=20):
    """Declarative twin: should over (title, body) on the flagship term,
    filtered by equals(lang) + range(n_chars) — the filter constrains the
    match set (total and page both shrink) and contributes zero score."""
    scored = _mf_scored(spark, sf_dir, _MF_Q, _MF_Q, require_both=False)
    attrs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    kept = (
        scored.join(attrs, "doc_id")
        .filter(
            (F.col("lang") == _DV_LANG)
            & (F.col("n_chars") >= _DV_LO)
            & (F.col("n_chars") < _DV_HI)
        )
        .select("doc_id", "score")
    )
    return ranked_topk(kept, [F.desc("score"), F.asc("doc_id")], k).select(
        "doc_id", "score", "rk"
    )


MF_DV_FILTER_TOPK_SQL = (
    "\nWITH "
    + _MF_CTES_TMPL.format(
        tt=_MF_Q, tb=_MF_Q, cond="tft > 0 OR tfb > 0", bt="1.0", bb="1.0"
    )
    + f"""
SELECT doc_id, score, rk
FROM (SELECT s.doc_id, s.score,
             row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS rk
      FROM scored s JOIN documents d USING (doc_id)
      WHERE d.lang = '{_DV_LANG}'
        AND d.n_chars >= {_DV_LO} AND d.n_chars < {_DV_HI})
WHERE rk <= 20
"""
)


def engine_mf_dv_filter_topk(spark, sf_dir, k=20):
    """The real engine's doc-values filter path: the same compound should
    plus Atlas range/equals operator objects on the filter list."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        should=[("title", _MF_Q), ("body", _MF_Q)],
        minimum_should_match=1,
        filter=[
            {"equals": {"path": "lang", "value": _DV_LANG}},
            {"range": {"path": "n_chars", "gte": _DV_LO, "lt": _DV_HI}},
        ],
        k=60,
    )
    return _engine_page_frame(spark, res, k)


ENGINE_MF_DV_FILTER_TOPK_SQL = MF_DV_FILTER_TOPK_SQL


def mf_dv_sort_topk(spark, sf_dir, k=20):
    """Declarative twin of the Atlas ``$search.sort`` option: the same
    compound should, ordered by the n_chars doc value (desc, doc_id asc
    tiebreak) instead of score — score still computed and returned."""
    scored = _mf_scored(spark, sf_dir, _MF_Q, _MF_Q, require_both=False)
    attrs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = scored.join(attrs, "doc_id")
    return ranked_topk(
        joined, [F.desc_nulls_last("n_chars"), F.asc("doc_id")], k
    ).select("doc_id", "score", "n_chars", "rk")


MF_DV_SORT_TOPK_SQL = (
    "\nWITH "
    + _MF_CTES_TMPL.format(
        tt=_MF_Q, tb=_MF_Q, cond="tft > 0 OR tfb > 0", bt="1.0", bb="1.0"
    )
    + """
SELECT doc_id, score, n_chars, rk
FROM (SELECT s.doc_id, s.score, d.n_chars,
             row_number() OVER (ORDER BY d.n_chars DESC NULLS LAST,
                                s.doc_id ASC) AS rk
      FROM scored s JOIN documents d USING (doc_id))
WHERE rk <= 20
"""
)


def engine_mf_dv_sort_topk(spark, sf_dir, k=20):
    """The real engine's field-sort path (sort= on search_fields): the
    page arrives in (n_chars desc, doc_id asc) order with the sort
    attribute as a column — no score re-rank, the field order IS the rank."""
    from ..numerics import round_half_away
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    res = eng.search_fields(
        should=[("title", _MF_Q), ("body", _MF_Q)],
        minimum_should_match=1,
        sort={"path": "n_chars", "order": "desc"},
        k=k,
    )
    pdf = res.page.copy()
    pdf["score"] = round_half_away(pdf["score"], 6)
    pdf["rk"] = range(1, len(pdf) + 1)
    return spark.createDataFrame(
        pdf[["doc_id", "score", "n_chars", "rk"]],
        "doc_id long, score double, n_chars long, rk int",
    )


ENGINE_MF_DV_SORT_TOPK_SQL = MF_DV_SORT_TOPK_SQL


# Atlas $searchMeta facets over doc values: bucket counts on the MATCHED
# set (never a page) — a string facet per distinct lang and a numeric facet
# over half-open n_chars bands labeled by their lower boundary.
_FACET_BOUNDS = (100, 250, 400, 550)


def engine_mf_facet_lang(spark, sf_dir):
    """String facet: matched-set counts per non-null lang, count desc then
    bucket asc (Atlas's bucket order)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    out = eng.facet_fields(
        should=[("title", _MF_Q), ("body", _MF_Q)],
        # pinned explicitly AND mirrored by the oracle's rk <= 10, so the
        # gate stays honest if a fixture ever grows an 11th lang
        facets={"langs": {"type": "string", "path": "lang", "num_buckets": 10}},
    )
    pdf = out["facet"]["langs"].copy()
    pdf["rk"] = range(1, len(pdf) + 1)
    return spark.createDataFrame(pdf, "bucket string, count long, rk int")


ENGINE_MF_FACET_LANG_SQL = (
    "\nWITH "
    + _MF_CTES_TMPL.format(
        tt=_MF_Q, tb=_MF_Q, cond="tft > 0 OR tfb > 0", bt="1.0", bb="1.0"
    )
    + """
SELECT bucket, count, rk
FROM (SELECT bucket, cnt AS count,
             row_number() OVER (ORDER BY cnt DESC, bucket ASC) AS rk
      FROM (SELECT d.lang AS bucket, COUNT(*) AS cnt
            FROM scored s JOIN documents d USING (doc_id)
            WHERE d.lang IS NOT NULL GROUP BY d.lang))
WHERE rk <= 10
"""
)


def engine_mf_facet_nchars(spark, sf_dir):
    """Numeric facet: half-open n_chars bands labeled by lower boundary;
    out-of-range matched docs land in no bucket (Atlas's rule)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _mf_index_for(spark, sf_dir))
    out = eng.facet_fields(
        should=[("title", _MF_Q), ("body", _MF_Q)],
        facets={
            "sizes": {
                "type": "number", "path": "n_chars",
                "boundaries": list(_FACET_BOUNDS),
            }
        },
    )
    pdf = out["facet"]["sizes"].copy()
    pdf["rk"] = range(1, len(pdf) + 1)
    return spark.createDataFrame(pdf, "bucket string, count long, rk int")


# The same dv plane on the SINGLE-field surface (the incremental-crawl
# shape): dv filter / field sort / keyword facets over the plain two-term
# disjunction, gated against the classic BM25 CTEs joined to documents.
# The shared gate index (_index_for) bakes (lang, n_chars) and — because it
# builds with id_col="doc_id" — exercises the doc_id-keyed sidecar join.


def engine_sf_dv_filter_topk(spark, sf_dir, k=20):
    """search(kw, dv_filter=[equals lang, range n_chars]) — FILTER
    constrains matching, survivors keep their unfiltered BM25 score."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    res = eng.search(
        " ".join(_Q_TERMS), k=60,
        dv_filter=[
            {"equals": {"path": "lang", "value": _DV_LANG}},
            {"range": {"path": "n_chars", "gte": _DV_LO, "lt": _DV_HI}},
        ],
    )
    return _engine_page_frame(spark, res, k)


ENGINE_SF_DV_FILTER_TOPK_SQL = (
    "\nWITH "
    + _BM25_CTES_TMPL.format(t1=_Q_TERMS[0], t2=_Q_TERMS[1])
    + f"""
SELECT doc_id, score, rk
FROM (SELECT s.doc_id, s.score,
             row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS rk
      FROM scored s JOIN documents d USING (doc_id)
      WHERE d.lang = '{_DV_LANG}'
        AND d.n_chars >= {_DV_LO} AND d.n_chars < {_DV_HI})
WHERE rk <= 20
"""
)


def engine_sf_dv_sort_topk(spark, sf_dir, k=20):
    """search(kw, sort=n_chars desc): the field order IS the rank."""
    from ..numerics import round_half_away
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    res = eng.search(
        " ".join(_Q_TERMS), k=k, sort={"path": "n_chars", "order": "desc"}
    )
    pdf = res.page.copy()
    pdf["score"] = round_half_away(pdf["score"], 6)
    pdf["rk"] = range(1, len(pdf) + 1)
    return spark.createDataFrame(
        pdf[["doc_id", "score", "n_chars", "rk"]],
        "doc_id long, score double, n_chars long, rk int",
    )


ENGINE_SF_DV_SORT_TOPK_SQL = (
    "\nWITH "
    + _BM25_CTES_TMPL.format(t1=_Q_TERMS[0], t2=_Q_TERMS[1])
    + """
SELECT doc_id, score, n_chars, rk
FROM (SELECT s.doc_id, s.score, d.n_chars,
             row_number() OVER (ORDER BY d.n_chars DESC NULLS LAST,
                                s.doc_id ASC) AS rk
      FROM scored s JOIN documents d USING (doc_id))
WHERE rk <= 20
"""
)


def engine_sf_kw_facet_lang(spark, sf_dir):
    """facet_fields(keyword=...): per-lang counts over the keyword's
    matched set (the crawl dashboard query)."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    out = eng.facet_fields(
        keyword=" ".join(_Q_TERMS),
        facets={"langs": {"type": "string", "path": "lang", "num_buckets": 10}},
    )
    pdf = out["facet"]["langs"].copy()
    pdf["rk"] = range(1, len(pdf) + 1)
    return spark.createDataFrame(pdf, "bucket string, count long, rk int")


ENGINE_SF_KW_FACET_LANG_SQL = (
    "\nWITH "
    + _BM25_CTES_TMPL.format(t1=_Q_TERMS[0], t2=_Q_TERMS[1])
    + """
SELECT bucket, count, rk
FROM (SELECT bucket, cnt AS count,
             row_number() OVER (ORDER BY cnt DESC, bucket ASC) AS rk
      FROM (SELECT d.lang AS bucket, COUNT(*) AS cnt
            FROM scored s JOIN documents d USING (doc_id)
            WHERE d.lang IS NOT NULL GROUP BY d.lang))
WHERE rk <= 10
"""
)


_FB = _FACET_BOUNDS
ENGINE_MF_FACET_NCHARS_SQL = (
    "\nWITH "
    + _MF_CTES_TMPL.format(
        tt=_MF_Q, tb=_MF_Q, cond="tft > 0 OR tfb > 0", bt="1.0", bb="1.0"
    )
    + f"""
SELECT bucket, cnt AS count,
       row_number() OVER (ORDER BY CAST(bucket AS BIGINT) ASC) AS rk
FROM (SELECT CASE
        WHEN d.n_chars >= {_FB[0]} AND d.n_chars < {_FB[1]} THEN '{_FB[0]}'
        WHEN d.n_chars >= {_FB[1]} AND d.n_chars < {_FB[2]} THEN '{_FB[1]}'
        WHEN d.n_chars >= {_FB[2]} AND d.n_chars < {_FB[3]} THEN '{_FB[2]}'
      END AS bucket, COUNT(*) AS cnt
      FROM scored s JOIN documents d USING (doc_id)
      GROUP BY 1)
WHERE bucket IS NOT NULL
"""
)


# --------------------------------------------------------------------------
# minimumShouldMatch m-of-n (Lucene general form; the reference only ever
# sets m=1, search_utils.py:134,188): docs matching at least m of the n
# query terms, scored as the plain disjunction over their matched terms.
# --------------------------------------------------------------------------

_MSM_TERMS = ("merge", "scan", "window")  # ascending — the engine's fold order
_MSM_M = 2


def engine_msm2_topk(spark, sf_dir, k=20):
    """The engine's m-of-n path (min_should_match=2 over 3 terms), on the
    distributed WAND plan (force_distributed) so range eligibility pruning
    with the >= m constraint is what the driver verifies."""
    from ..query.engine import SearchEngine

    eng = SearchEngine(spark, _index_for(spark, sf_dir))
    res = eng.search(
        " ".join(_MSM_TERMS), k=60, min_should_match=_MSM_M,
        mode="wand", force_distributed=True,
    )
    return _engine_page_frame(spark, res, k)


ENGINE_MSM2_TOPK_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS dl,
         CAST(len(list_filter({TOKENS_SQL}, x -> x = '{_MSM_TERMS[0]}')) AS DOUBLE) AS tf1,
         CAST(len(list_filter({TOKENS_SQL}, x -> x = '{_MSM_TERMS[1]}')) AS DOUBLE) AS tf2,
         CAST(len(list_filter({TOKENS_SQL}, x -> x = '{_MSM_TERMS[2]}')) AS DOUBLE) AS tf3
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sum_dl,
         CAST(COUNT(*) FILTER (WHERE tf1 > 0) AS DOUBLE) AS df1,
         CAST(COUNT(*) FILTER (WHERE tf2 > 0) AS DOUBLE) AS df2,
         CAST(COUNT(*) FILTER (WHERE tf3 > 0) AS DOUBLE) AS df3
  FROM base
), scored AS (
  SELECT doc_id,
         round(
           (CASE WHEN tf1 > 0 THEN
              ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1
                / (tf1 + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n)))
            ELSE 0.0 END)
           + (CASE WHEN tf2 > 0 THEN
              ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2
                / (tf2 + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n)))
            ELSE 0.0 END)
           + (CASE WHEN tf3 > 0 THEN
              ln(1.0 + (n - df3 + 0.5) / (df3 + 0.5)) * tf3
                / (tf3 + {K1} * (1.0 - {B} + {B} * dl / (sum_dl / n)))
            ELSE 0.0 END), 6) AS score
  FROM base CROSS JOIN stats
  WHERE CAST(tf1 > 0 AS INT) + CAST(tf2 > 0 AS INT) + CAST(tf3 > 0 AS INT) >= {_MSM_M}
)
SELECT doc_id, score, rk
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= 20
"""


# --------------------------------------------------------------------------
# C7: query-log sink — the engine appends one request/response row per
# search (reference logs every endpoint hit, app.py:62-64,436-438,525-526).
# The gate runs a fixed query set with logging on, reads the log TABLE back
# from disk, and the oracle recomputes what each logged row must contain
# from the corpus — verifying both the engine results and the sink
# round-trip in one pass.
# --------------------------------------------------------------------------

_QLOG_QUERIES = ("merge scan", "scan window", "merge window")


def query_log_replay(spark, sf_dir):
    import shutil

    from ..catalog import IndexCatalog
    from ..query.engine import SearchEngine

    index_dir = _index_for(spark, sf_dir)
    cat = IndexCatalog(index_dir)
    shutil.rmtree(cat.query_log_dir, ignore_errors=True)
    eng = SearchEngine(spark, index_dir, log_queries=True)
    for kw in _QLOG_QUERIES:
        eng.search(kw, k=10)
    log = cat.read_query_log().to_pandas()
    log["top_score"] = round_half_away(log["top_score"], 6)
    return spark.createDataFrame(
        log[["qid", "keyword", "total", "top_doc_id", "top_score"]],
        "qid int, keyword string, total long, top_doc_id long, top_score double",
    )


def _qlog_entry_sql(qid: int, kw: str) -> str:
    t1, t2 = kw.split()
    ctes = _BM25_CTES_TMPL.format(t1=t1, t2=t2)
    return f"""SELECT * FROM (
WITH {ctes}
SELECT {qid} AS qid, '{kw}' AS keyword,
       (SELECT COUNT(*) FROM scored) AS total,
       doc_id AS top_doc_id, score AS top_score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 1
)"""


QUERY_LOG_REPLAY_SQL = "\nUNION ALL\n".join(
    _qlog_entry_sql(i + 1, kw) for i, kw in enumerate(_QLOG_QUERIES)
)


QUERIES = {
    "ft_engine_bm25_topk": engine_bm25_topk,
    "ft_engine_phrase_topk": engine_phrase_topk,
    "ft_wildcard_topk": wildcard_topk,
    "ft_engine_wildcard_topk": engine_wildcard_topk,
    "ft_damerau_topk": damerau_topk,
    "ft_engine_damerau_topk": engine_damerau_topk,
    "ft_engine_suggest_damerau": engine_suggest_damerau,
    "ft_phonetic_topk": phonetic_topk,
    "ft_engine_phonetic_topk": engine_phonetic_topk,
    "ft_prefix_fuzzy_topk": prefix_fuzzy_topk,
    "ft_engine_prefix_fuzzy_topk": engine_prefix_fuzzy_topk,
    "ft_multifield_topk": multifield_topk,
    "ft_engine_multifield_topk": engine_multifield_topk,
    "ft_mf_dv_filter_topk": mf_dv_filter_topk,
    "ft_engine_mf_dv_filter_topk": engine_mf_dv_filter_topk,
    "ft_mf_dv_sort_topk": mf_dv_sort_topk,
    "ft_engine_mf_dv_sort_topk": engine_mf_dv_sort_topk,
    "ft_engine_mf_facet_lang": engine_mf_facet_lang,
    "ft_engine_mf_facet_nchars": engine_mf_facet_nchars,
    "ft_engine_sf_dv_filter_topk": engine_sf_dv_filter_topk,
    "ft_engine_sf_dv_sort_topk": engine_sf_dv_sort_topk,
    "ft_engine_sf_kw_facet_lang": engine_sf_kw_facet_lang,
    "ft_engine_multifield_must": engine_multifield_must,
    "ft_engine_multifield_mustnot": engine_multifield_mustnot,
    "ft_engine_multifield_boost": engine_multifield_boost,
    "ft_engine_multifield_filter": engine_multifield_filter,
    "ft_engine_mlt_topk": engine_mlt_topk,
    "ft_regex_topk": regex_topk,
    "ft_engine_regex_topk": engine_regex_topk,
    "ft_engine_multifield_fuzzy": engine_multifield_fuzzy,
    "ft_engine_multifield_phrase": engine_multifield_phrase,
    "ft_engine_msm2_topk": engine_msm2_topk,
    # registered last on purpose: with the round-5 window rotation these are
    # the ft gates that fall outside the driver's 50-gate window, and every
    # one is already driver-verified (CORRECTNESS_r04 — incl. ft_term_stats /
    # ft_tf_topk / ft_prefix_terms, rotated down to make window room for the
    # mustNot/boost/wildcard gates) + CHECKGATE-covered
    "ft_term_stats": term_stats,
    "ft_tf_topk": tf_topk,
    "ft_must_should": must_should,
    "ft_bm25_topk": bm25_topk,
    "ft_prefix_terms": prefix_terms,
    "ft_fuzzy_topk": fuzzy_topk,
    "ft_engine_fuzzy_topk": engine_fuzzy_topk,
    "ft_phrase_topk": phrase_topk,
    "ft_phrase_near_topk": phrase_near_topk,
    "ft_engine_phrase_near_topk": engine_phrase_near_topk,
    "ft_engine_suggest": engine_suggest,
    "ft_engine_highlight_topk": engine_highlight_topk,
    "ft_engine_phrase_first_pos": engine_phrase_first_pos,
    "ft_stream_ingest_topk": stream_ingest_topk,
    "ft_compacted_topk": compacted_topk,
    "ft_grouped_topk": grouped_topk,
    "ft_engine_grouped_topk": engine_grouped_topk,
    "ft_query_log_replay": query_log_replay,
}

ORACLES = {
    "ft_term_stats": TERM_STATS_SQL,
    "ft_prefix_terms": PREFIX_TERMS_SQL,
    "ft_tf_topk": TF_TOPK_SQL,
    "ft_must_should": MUST_SHOULD_SQL,
    "ft_bm25_topk": BM25_TOPK_SQL,
    "ft_engine_bm25_topk": ENGINE_BM25_TOPK_SQL,
    "ft_phrase_topk": PHRASE_TOPK_SQL,
    "ft_engine_phrase_topk": ENGINE_PHRASE_TOPK_SQL,
    "ft_phrase_near_topk": PHRASE_NEAR_TOPK_SQL,
    "ft_engine_phrase_near_topk": ENGINE_PHRASE_NEAR_TOPK_SQL,
    "ft_fuzzy_topk": FUZZY_TOPK_SQL,
    "ft_engine_fuzzy_topk": ENGINE_FUZZY_TOPK_SQL,
    "ft_wildcard_topk": WILDCARD_TOPK_SQL,
    "ft_engine_wildcard_topk": ENGINE_WILDCARD_TOPK_SQL,
    "ft_engine_suggest": ENGINE_SUGGEST_SQL,
    "ft_damerau_topk": DAMERAU_TOPK_SQL,
    "ft_engine_damerau_topk": ENGINE_DAMERAU_TOPK_SQL,
    "ft_engine_suggest_damerau": ENGINE_SUGGEST_DAMERAU_SQL,
    "ft_phonetic_topk": PHONETIC_TOPK_SQL,
    "ft_engine_phonetic_topk": ENGINE_PHONETIC_TOPK_SQL,
    "ft_prefix_fuzzy_topk": PREFIX_FUZZY_TOPK_SQL,
    "ft_engine_prefix_fuzzy_topk": ENGINE_PREFIX_FUZZY_TOPK_SQL,
    "ft_engine_highlight_topk": ENGINE_HIGHLIGHT_TOPK_SQL,
    "ft_engine_phrase_first_pos": ENGINE_PHRASE_FIRST_POS_SQL,
    "ft_stream_ingest_topk": STREAM_INGEST_TOPK_SQL,
    "ft_compacted_topk": COMPACTED_TOPK_SQL,
    "ft_grouped_topk": GROUPED_TOPK_SQL,
    "ft_engine_grouped_topk": GROUPED_TOPK_SQL,
    "ft_multifield_topk": MULTIFIELD_TOPK_SQL,
    "ft_engine_multifield_topk": ENGINE_MULTIFIELD_TOPK_SQL,
    "ft_mf_dv_filter_topk": MF_DV_FILTER_TOPK_SQL,
    "ft_engine_mf_dv_filter_topk": ENGINE_MF_DV_FILTER_TOPK_SQL,
    "ft_mf_dv_sort_topk": MF_DV_SORT_TOPK_SQL,
    "ft_engine_mf_dv_sort_topk": ENGINE_MF_DV_SORT_TOPK_SQL,
    "ft_engine_mf_facet_lang": ENGINE_MF_FACET_LANG_SQL,
    "ft_engine_mf_facet_nchars": ENGINE_MF_FACET_NCHARS_SQL,
    "ft_engine_sf_dv_filter_topk": ENGINE_SF_DV_FILTER_TOPK_SQL,
    "ft_engine_sf_dv_sort_topk": ENGINE_SF_DV_SORT_TOPK_SQL,
    "ft_engine_sf_kw_facet_lang": ENGINE_SF_KW_FACET_LANG_SQL,
    "ft_engine_multifield_must": ENGINE_MULTIFIELD_MUST_SQL,
    "ft_engine_multifield_mustnot": ENGINE_MULTIFIELD_MUSTNOT_SQL,
    "ft_engine_multifield_boost": ENGINE_MULTIFIELD_BOOST_SQL,
    "ft_engine_multifield_filter": ENGINE_MULTIFIELD_FILTER_SQL,
    "ft_engine_mlt_topk": ENGINE_MLT_TOPK_SQL,
    "ft_regex_topk": REGEX_TOPK_SQL,
    "ft_engine_regex_topk": ENGINE_REGEX_TOPK_SQL,
    "ft_engine_multifield_fuzzy": ENGINE_MULTIFIELD_FUZZY_SQL,
    "ft_engine_multifield_phrase": ENGINE_MULTIFIELD_PHRASE_SQL,
    "ft_engine_msm2_topk": ENGINE_MSM2_TOPK_SQL,
    "ft_query_log_replay": QUERY_LOG_REPLAY_SQL,
}
