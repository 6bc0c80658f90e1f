"""ETL source/sink operators — reference SURVEY.md §2.C parity.

- C1 CSV ingestion (reference utils.py:20-34, ``csv.DictReader`` ->
  ``insert_many``): the gate entry round-trips the orders table through an
  on-disk CSV — Spark writes it, ``spark.read.csv`` with an explicit schema
  reads it back, and the aggregate must hash-match an oracle computed over
  the ORIGINAL parquet rows.  Any parse/format divergence (quoting, double
  formatting, header handling) fails the gate, which is exactly what a CSV
  source has to prove.
- C6 array add/remove sink (reference lamda/tags.py:41-69, ``$push``/
  ``$pull`` of tag ids): ``array_union`` + ``array_remove`` over a token
  array; the gate compares the sorted merged set (set semantics, not
  order, is the contract — the reference's Mongo arrays are unordered
  sets of tag ids).

At 100 TB: CSV scans parallelize per-file/per-split like any Spark source
(schema pinned, no inference pass), and the tag merge is the SET clause of
an Iceberg ``MERGE INTO`` — both stay declarative end to end.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from ._common import dec_sum, dec_sum_sql, t, tokens_col, TOKENS_SQL

# --------------------------------------------------------------------------
# C1: CSV source round-trip
# --------------------------------------------------------------------------

_CSV_SCHEMA = (
    "o_orderkey long, o_orderstatus string, o_totalprice double, o_orderpriority string"
)


def csv_orders_by_priority(spark, sf_dir):
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "ses_csv_orders_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    src.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(_CSV_SCHEMA).option("header", True).csv(path)
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("sum_price"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


CSV_ORDERS_BY_PRIORITY_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {dec_sum_sql('o_totalprice')} AS sum_price,
       COUNT(DISTINCT o_orderstatus) AS n_status
FROM orders
GROUP BY o_orderpriority
"""

# --------------------------------------------------------------------------
# C6: array add/remove merge
# --------------------------------------------------------------------------

def tag_array_merge(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks8 = F.slice(tokens_col(), 1, 8)
    merged = F.array_sort(
        F.array_remove(F.array_union(toks8, F.array(F.lit("zzadded"))), "the")
    )
    return d.select(
        "doc_id",
        F.array_join(merged, " ").alias("tags"),
        F.size(merged).alias("n_tags"),
    )


TAG_ARRAY_MERGE_SQL = f"""
SELECT doc_id,
       array_to_string(merged, ' ') AS tags,
       CAST(len(merged) AS INT) AS n_tags
FROM (
  SELECT doc_id,
         list_sort(list_filter(
           list_distinct(list_concat(list_slice({TOKENS_SQL}, 1, 8), ['zzadded'])),
           x -> x <> 'the')) AS merged
  FROM documents
)
"""


# --------------------------------------------------------------------------
# C9: batch score backfill — the reference walks every product in chunks and
# writes a recomputed score per id (helper_function/product_score.py:1-21, a
# driver-side loop of point updates).  Declaratively it is ONE join: the
# per-key score aggregate joined back onto the dimension, every row updated
# in a single distributed pass (an Iceberg MERGE INTO at cluster scale).
# --------------------------------------------------------------------------

def score_backfill(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    scores = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("score"),
        F.count("*").alias("n_lines"),
    )
    return (
        p.join(scores, p.p_partkey == scores.l_partkey, "left")
        .select(
            "p_partkey",
            "p_brand",
            F.coalesce("score", F.lit(0)).alias("score"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
    )


SCORE_BACKFILL_SQL = """
SELECT p_partkey, p_brand,
       coalesce(score, 0) AS score, coalesce(n_lines, 0) AS n_lines
FROM part
LEFT JOIN (SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS score,
                  COUNT(*) AS n_lines
           FROM lineitem GROUP BY l_partkey) s
  ON p_partkey = s.l_partkey
"""


QUERIES = {
    "etl_csv_orders_by_priority": csv_orders_by_priority,
    "etl_tag_array_merge": tag_array_merge,
    "etl_score_backfill": score_backfill,
}

ORACLES = {
    "etl_csv_orders_by_priority": CSV_ORDERS_BY_PRIORITY_SQL,
    "etl_tag_array_merge": TAG_ARRAY_MERGE_SQL,
    "etl_score_backfill": SCORE_BACKFILL_SQL,
}
