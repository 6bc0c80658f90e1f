"""Text-analysis operators over the ``documents`` table — the pieces a
large-scale training-data pipeline needs (token counting, quality scoring,
language-ID heuristics, content fingerprinting).

All expressions are built-in column functions (JVM-side, whole-stage codegen)
— no Python in the per-row path.  The tokenizer matches the engine's pinned
analyzer on this corpus (see operators/_common.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import MD5_LONG_SQL, TOKENS_SQL, md5_long, t, tokens_col

_STOPWORDS = ("the", "a")

# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------

def token_counts(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars_raw"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len({TOKENS_SQL}) AS n_tokens,
       len(list_distinct({TOKENS_SQL})) AS n_distinct,
       length(text) AS n_chars_raw
FROM documents
"""

# --------------------------------------------------------------------------
# quality scoring: stopword ratio + length + punctuation density.
# Single-row arithmetic with pinned operand order -> bit-identical doubles.
# --------------------------------------------------------------------------

def quality_scores(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
    punct = (F.length("text") - F.length(F.replace(F.col("text"), F.lit(",")))).cast("double")
    score = (
        F.lit(0.5) * (stop_hits / n)
        + F.lit(0.3) * (F.least(n, F.lit(200.0)) / F.lit(200.0))
        + F.lit(0.2) * (punct / n)
    )
    return d.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        stop_hits.cast("long").alias("stop_hits"),
        punct.cast("long").alias("punct_count"),
    )


QUALITY_SCORES_SQL = f"""
SELECT doc_id,
       round(0.5 * (stop_hits / n)
             + 0.3 * (least(n, 200.0) / 200.0)
             + 0.2 * (punct / n), 6) AS quality,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       CAST(punct AS BIGINT) AS punct_count
FROM (
  SELECT doc_id,
         CAST(len({TOKENS_SQL}) AS DOUBLE) AS n,
         CAST(len(list_filter({TOKENS_SQL}, x -> x IN ('the', 'a'))) AS DOUBLE) AS stop_hits,
         CAST(length(text) - length(replace(text, ',', '')) AS DOUBLE) AS punct
  FROM documents
)
"""

# --------------------------------------------------------------------------
# language-ID heuristic: stopword-hit-ratio n-gram classifier (degenerate
# 1-gram form; the corpus vocabulary is English-only so the heuristic checks
# function-word density, the standard cheap lang-ID signal)
# --------------------------------------------------------------------------

def lang_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
    pred = F.when(stop_hits / n >= F.lit(0.05), F.lit("en")).otherwise(F.lit("und"))
    return d.select("doc_id", F.col("lang").alias("tagged_lang"), pred.alias("pred_lang"))


LANG_ID_SQL = f"""
SELECT doc_id, lang AS tagged_lang,
       CASE WHEN CAST(len(list_filter({TOKENS_SQL}, x -> x IN ('the', 'a'))) AS DOUBLE)
                 / CAST(len({TOKENS_SQL}) AS DOUBLE) >= 0.05
            THEN 'en' ELSE 'und' END AS pred_lang
FROM documents
"""

# --------------------------------------------------------------------------
# document fingerprinting: md5 content hash of the normalized token stream,
# plus the 60-bit integer form used by the dedup/minhash operators
# --------------------------------------------------------------------------

def fingerprints(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    norm = F.concat_ws(" ", tokens_col())
    return d.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        md5_long(norm).alias("fp_long"),
    )


FINGERPRINTS_SQL = f"""
SELECT doc_id,
       md5(array_to_string({TOKENS_SQL}, ' ')) AS fp_md5,
       {MD5_LONG_SQL.format(x=f"array_to_string({TOKENS_SQL}, ' ')")} AS fp_long
FROM documents
"""

# --------------------------------------------------------------------------
# corpus-level language/source profile
# --------------------------------------------------------------------------

def corpus_profile(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


CORPUS_PROFILE_SQL = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
"""


# --------------------------------------------------------------------------
# per-language document-length quantiles — the exact (sort-based) form is
# the oracle-checkable twin of the sketch path a 100 TB profile job uses
# (percentile_approx / approx_count_distinct, whose error bounds are pinned
# in tests/test_operators.py::test_sketch_accuracy_bounds — sketches are
# mergeable/one-pass but engine-specific, so the gate hashes the exact
# form).  Both engines interpolate quantiles linearly; rounded to 6.
# --------------------------------------------------------------------------

def length_quantiles(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(tokens_col())
    base = d.select("lang", n_tok.cast("double").alias("n"))
    return base.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(n, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(n, 0.75)"), 6).alias("q75"),
        F.round(F.expr("percentile(n, 0.95)"), 6).alias("q95"),
        F.min("n").cast("long").alias("min_n"),
        F.max("n").cast("long").alias("max_n"),
    )


LENGTH_QUANTILES_SQL = f"""
SELECT lang, COUNT(*) AS n_docs,
       round(quantile_cont(n, 0.25), 6) AS q25,
       round(quantile_cont(n, 0.5), 6) AS median,
       round(quantile_cont(n, 0.75), 6) AS q75,
       round(quantile_cont(n, 0.95), 6) AS q95,
       CAST(MIN(n) AS BIGINT) AS min_n, CAST(MAX(n) AS BIGINT) AS max_n
FROM (SELECT lang, CAST(len({TOKENS_SQL}) AS DOUBLE) AS n FROM documents)
GROUP BY lang
"""


QUERIES = {
    "txt_token_counts": token_counts,
    "txt_quality_scores": quality_scores,
    "txt_lang_id": lang_id,
    "txt_fingerprints": fingerprints,
    "txt_corpus_profile": corpus_profile,
    "txt_length_quantiles": length_quantiles,
}

ORACLES = {
    "txt_token_counts": TOKEN_COUNTS_SQL,
    "txt_quality_scores": QUALITY_SCORES_SQL,
    "txt_lang_id": LANG_ID_SQL,
    "txt_fingerprints": FINGERPRINTS_SQL,
    "txt_corpus_profile": CORPUS_PROFILE_SQL,
    "txt_length_quantiles": LENGTH_QUANTILES_SQL,
}
