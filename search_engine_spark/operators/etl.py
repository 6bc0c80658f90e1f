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


QUERIES = {
    "etl_csv_orders_by_priority": csv_orders_by_priority,
    "etl_tag_array_merge": tag_array_merge,
}

ORACLES = {
    "etl_csv_orders_by_priority": CSV_ORDERS_BY_PRIORITY_SQL,
    "etl_tag_array_merge": TAG_ARRAY_MERGE_SQL,
}
