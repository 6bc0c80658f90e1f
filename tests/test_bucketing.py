"""Bucketed co-located joins: the shuffle-elimination technique SCALE.md
claims for repeated fact-fact joins, demonstrated on a real physical plan.

Writing both sides bucketed (+sorted) on the join key lets Spark plan a
SortMergeJoin whose children read the bucket layout directly — ZERO
Exchange operators — while an unbucketed join of the same data must
shuffle both sides.  At 100 TB this turns every repeated join/groupBy on
the bucket key into a scan-only stage (the index builder's analog is the
(pid, term, sseg)-keyed segment layout).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "lang", "n_chars")
    right = docs.select("doc_id", F.length("text").alias("text_len"))
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    (left.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite")
        .saveAsTable("b_left"))
    (right.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite")
        .saveAsTable("b_right"))
    return "b_left", "b_right"


def test_bucketed_join_runs_without_exchange(spark, sf_dir, bucketed_tables):
    lname, rname = bucketed_tables
    bl, br = spark.table(lname), spark.table(rname)
    # the fixture tables are tiny, so the planner would pick a broadcast
    # join and skip the bucket layout entirely; the merge hint pins the
    # sort-merge strategy a 100 TB fact-fact join would get, which is the
    # plan shape the bucket layout is FOR
    joined = (
        bl.hint("merge").join(br, "doc_id")
        .select("doc_id", "lang", "n_chars", "text_len")
    )

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"

    # and the result is the same as the plain (shuffling) parquet join
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = (
        docs.select("doc_id", "lang", "n_chars")
        .join(docs.select("doc_id", F.length("text").alias("text_len")), "doc_id")
    )
    got = joined.orderBy("doc_id").toPandas()
    exp = expect.orderBy("doc_id").toPandas()
    assert got.equals(exp[got.columns.tolist()])


def test_bucketed_groupby_runs_without_exchange(spark, bucketed_tables):
    lname, _ = bucketed_tables
    agg = spark.table(lname).groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan[:2000]}"
    assert agg.count() == spark.table(lname).count()
