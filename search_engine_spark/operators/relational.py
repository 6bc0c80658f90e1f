"""Relational operators — parity with the reference's Mongo aggregation
pipelines (SURVEY.md §2.B), re-expressed as declarative Spark DataFrame plans
so Catalyst handles pushdown/pruning/join-strategy.

Scale notes (100 TB discipline):

- Dimension joins (nation/region/customer) are marked ``F.broadcast`` — the
  reference's in-process ``STORE_WH_MAP`` dict (constants.py:17) is the same
  idea (SURVEY.md §2 C8).
- "dedup keep first" (reference ``$group``+``$first``, pipelines.py:313-347)
  is a window + ``row_number`` with a pinned tiebreak — Mongo's version is
  nondeterministic, ours is not (SURVEY.md §7 watch-list 2).
- Pagination (reference ``$skip/$limit`` inside ``$facet``,
  pipelines.py:27-42) uses ``row_number`` over the sort order, not a global
  collect; Catalyst turns the top-k into TakeOrderedAndProject.
- All money sums go through DECIMAL (exact, shuffle-order-independent) and
  cast to double at the end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._common import dec_sum, dec_sum_sql, ranked_topk, t

# --------------------------------------------------------------------------
# B1/B2: filter + project with computed column (reference $match+$project,
# pipelines.py:8-14,227-247)
# --------------------------------------------------------------------------

def filter_project(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # integer-cents arithmetic: price and discount are 2-decimal values, so
    # cents * (100 - disc_pct) is exact — no engine-dependent double rounding
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc100 = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_shipdate") >= F.lit("1995-07-01")))
        .select(
            "l_orderkey",
            "l_linenumber",
            ((cents * (F.lit(100) - disc100)).cast("double") / F.lit(10000.0)).alias("net_price"),
        )
    )


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0
           AS net_price
FROM lineitem
WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-07-01'
"""

# --------------------------------------------------------------------------
# B3: grouped aggregation (TPC-H Q1 shape; reference $group+$sum,
# pipelines.py:15-21,517-524)
# --------------------------------------------------------------------------

def pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       {dec_sum_sql('l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# B4: dedup keep-first with deterministic tiebreak (reference $group+$first,
# pipelines.py:313-347 — nondeterministic there; pinned here)
# --------------------------------------------------------------------------

def dedup_first_order(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


DEDUP_FIRST_ORDER_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""

# --------------------------------------------------------------------------
# B6: lookup join to broadcast dims + rollup (reference $lookup,
# pipelines.py:62-73; STORE_WH_MAP broadcast, constants.py:17)
# --------------------------------------------------------------------------

def customer_nation_rollup(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            dec_sum("c_acctbal").alias("acctbal_sum"),
        )
    )


CUSTOMER_NATION_ROLLUP_SQL = f"""
SELECT r_name, n_name, COUNT(*) AS n_cust, {dec_sum_sql('c_acctbal')} AS acctbal_sum
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

# --------------------------------------------------------------------------
# B6/B7: fact-to-dim join + group (reference correlated $lookup,
# pipelines.py:93-112)
# --------------------------------------------------------------------------

def orders_by_segment(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_price"),
        )
    )


ORDERS_BY_SEGMENT_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {dec_sum_sql('o_totalprice')} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

# --------------------------------------------------------------------------
# B8: left-semi join (reference join-existence filter, pipelines.py:370-375)
# --------------------------------------------------------------------------

def customers_with_open_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


CUSTOMERS_WITH_OPEN_ORDERS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment
"""

# --------------------------------------------------------------------------
# anti join — the complement of B8
# --------------------------------------------------------------------------

def customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

# --------------------------------------------------------------------------
# B9: explode / unwind (reference $unwind, pipelines.py:507-509)
# --------------------------------------------------------------------------

def explode_part_words(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


EXPLODE_PART_WORDS_SQL = """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
GROUP BY word
"""

# --------------------------------------------------------------------------
# B10/B11: deterministic sort + offset pagination (reference $sort+$skip+
# $limit, pipelines.py:82-88; $facet page, app.py:510-511)
# --------------------------------------------------------------------------

def sort_paginate_orders(spark, sf_dir):
    # two-phase pagination: TakeOrderedAndProject keeps the top skip+limit
    # rows (bounded heap per partition + driver merge), then ranks only those
    # — no single-partition global sort at any scale
    o = t(spark, sf_dir, "orders")
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    return (
        ranked_topk(o.select("o_orderkey", "o_totalprice"), order, 30, "rn")
        .filter(F.col("rn") > 10)
        .select("o_orderkey", "o_totalprice", "rn")
    )


SORT_PAGINATE_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice, rn
FROM (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn > 10 AND rn <= 30
"""

# --------------------------------------------------------------------------
# B12/B13/B20: facet counts in one pass via grouping sets (reference $facet,
# pipelines.py:27-42; Counter facets, app.py:377-378)
# --------------------------------------------------------------------------

def facet_counts(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("_rel_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, '*') AS priority,
               coalesce(o_orderstatus, '*') AS status,
               COUNT(*) AS n
        FROM _rel_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


FACET_COUNTS_SQL = """
SELECT coalesce(o_orderpriority, '*') AS priority,
       coalesce(o_orderstatus, '*') AS status,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""

# --------------------------------------------------------------------------
# B17: type casts at read time (reference $toDouble/$dateFromString,
# pipelines.py:231-241) — floor() pinned on both sides because bare
# double->int casts round differently across engines
# --------------------------------------------------------------------------

def casts_event_day(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.floor("value").cast("long").alias("value_int"),
        )
        .groupBy("day")
        .agg(F.count("*").alias("n"), F.sum("value_int").alias("sum_value_int"))
    )


CASTS_EVENT_DAY_SQL = """
SELECT date_trunc('day', ts) AS day, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_value_int
FROM events
GROUP BY date_trunc('day', ts)
"""

# --------------------------------------------------------------------------
# top-k per group (window ranking — SURVEY.md §2.D notes the reference lacks
# it; Spark-native upgrade of its sort+limit idiom)
# --------------------------------------------------------------------------

def topk_parts_per_brand(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


TOPK_PARTS_PER_BRAND_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
  FROM part
) WHERE rk <= 3
"""

# --------------------------------------------------------------------------
# group rollup + top-k (reference /v2/search group rollup,
# pipelines.py:484-563: sum inventory per group then rank)
# --------------------------------------------------------------------------

def order_quantity_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_orderkey").agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
    order = [F.desc("total_qty"), F.asc("l_orderkey")]
    return ranked_topk(agg, order, 25).select("l_orderkey", "total_qty", "rk")


ORDER_QUANTITY_ROLLUP_SQL = """
SELECT l_orderkey, total_qty, rk
FROM (
  SELECT l_orderkey, total_qty,
         row_number() OVER (ORDER BY total_qty DESC, l_orderkey ASC) AS rk
  FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey)
) WHERE rk <= 25
"""

# --------------------------------------------------------------------------
# B6/C8 variant through the supplier dimension: fact -> dim -> dim chain
# (lineitem -> supplier -> nation), revenue in exact decimal arithmetic —
# the reference's warehouse-side rollup (pipelines.py:517-524 against the
# STORE_WH_MAP denormalization) with both dims broadcast.
# --------------------------------------------------------------------------

def supplier_revenue_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


SUPPLIER_REVENUE_ROLLUP_SQL = """
SELECT n_name, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
       COUNT(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""

# --------------------------------------------------------------------------
# B5: $push $$ROOT — collect whole rows into a per-group array (reference
# $group + $push $$ROOT, pipeline_utils.py:17-21, lamda/inventory_sync.py:
# 40-43).  Mongo's array order is nondeterministic; here the array is
# sort_array'd on (date, orderkey), a deterministic total order.  The array
# of structs is serialized to one string per group so the value hash is
# comparable across engines (array<struct> encodings differ).
# --------------------------------------------------------------------------

def push_root_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    row = F.struct(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.col("o_orderkey").alias("k"),
        cents.alias("p"),
    )
    grouped = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list(row)).alias("docs")
    )
    return grouped.select(
        "o_custkey",
        F.size("docs").alias("n_docs"),
        F.array_join(
            F.transform(
                "docs",
                lambda s: F.concat_ws(":", s["d"], s["k"].cast("string"), s["p"].cast("string")),
            ),
            "|",
        ).alias("docs_repr"),
    )


PUSH_ROOT_ORDERS_SQL = """
SELECT o_custkey, CAST(COUNT(*) AS INT) AS n_docs,
       string_agg(
         strftime(o_orderdate, '%Y-%m-%d') || ':' || CAST(o_orderkey AS VARCHAR)
           || ':' || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
         '|' ORDER BY strftime(o_orderdate, '%Y-%m-%d'), o_orderkey) AS docs_repr
FROM orders
GROUP BY o_custkey
"""

# --------------------------------------------------------------------------
# B19: distinct (reference client-side list(set(...)), pipelines.py:430-431)
# --------------------------------------------------------------------------

def distinct_segments(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"

# --------------------------------------------------------------------------
# B16/A8: conditional boost arithmetic (reference $cond/$add availability
# boost, search_utils.py:157-165)
# --------------------------------------------------------------------------

def conditional_boost(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    boosted = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice") + F.lit(10.0)).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey", F.round(boosted, 2).alias("boosted_price")
    ).filter(F.col("o_totalprice") > 400000.0)


CONDITIONAL_BOOST_SQL = """
SELECT o_orderkey,
       round(CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0
                  ELSE o_totalprice END, 2) AS boosted_price
FROM orders WHERE o_totalprice > 400000.0
"""


QUERIES = {
    "rel_filter_project": filter_project,
    "rel_pricing_summary": pricing_summary,
    "rel_dedup_first_order": dedup_first_order,
    "rel_customer_nation_rollup": customer_nation_rollup,
    "rel_orders_by_segment": orders_by_segment,
    "rel_semi_join_open_orders": customers_with_open_orders,
    "rel_anti_join_no_orders": customers_without_orders,
    "rel_explode_part_words": explode_part_words,
    "rel_sort_paginate_orders": sort_paginate_orders,
    "rel_facet_counts": facet_counts,
    "rel_casts_event_day": casts_event_day,
    "rel_topk_parts_per_brand": topk_parts_per_brand,
    "rel_order_quantity_rollup": order_quantity_rollup,
    "rel_distinct_segments": distinct_segments,
    "rel_conditional_boost": conditional_boost,
    "rel_push_root": push_root_orders,
    "rel_supplier_revenue": supplier_revenue_rollup,
}

ORACLES = {
    "rel_filter_project": FILTER_PROJECT_SQL,
    "rel_pricing_summary": PRICING_SUMMARY_SQL,
    "rel_dedup_first_order": DEDUP_FIRST_ORDER_SQL,
    "rel_customer_nation_rollup": CUSTOMER_NATION_ROLLUP_SQL,
    "rel_orders_by_segment": ORDERS_BY_SEGMENT_SQL,
    "rel_semi_join_open_orders": CUSTOMERS_WITH_OPEN_ORDERS_SQL,
    "rel_anti_join_no_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "rel_explode_part_words": EXPLODE_PART_WORDS_SQL,
    "rel_sort_paginate_orders": SORT_PAGINATE_ORDERS_SQL,
    "rel_facet_counts": FACET_COUNTS_SQL,
    "rel_casts_event_day": CASTS_EVENT_DAY_SQL,
    "rel_topk_parts_per_brand": TOPK_PARTS_PER_BRAND_SQL,
    "rel_order_quantity_rollup": ORDER_QUANTITY_ROLLUP_SQL,
    "rel_distinct_segments": DISTINCT_SEGMENTS_SQL,
    "rel_conditional_boost": CONDITIONAL_BOOST_SQL,
    "rel_push_root": PUSH_ROOT_ORDERS_SQL,
    "rel_supplier_revenue": SUPPLIER_REVENUE_ROLLUP_SQL,
}
