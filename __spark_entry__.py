"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship path end-to-end: build the inverted index over
the sf0.001 documents table with the distributed builder, then answer a
multi-term BM25 top-k query with the block-max-WAND engine.

``queries()``/``oracle_sql()`` expose the operator library
(search_engine_spark/operators/*): every SURVEY.md §2 operator family plus
the training-data-pipeline set (dedup, similarity, text stats, multimodal
plumbing), each with a DuckDB-runnable ANSI-SQL oracle unless the operator is
not SQL-expressible (stubbed-codec multimodal paths -> rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index build + BM25 WAND top-k on /root/testdata/sf0.001."""
    from search_engine_spark.operators.fulltext import engine_bm25_topk

    return engine_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from search_engine_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from search_engine_spark.operators import all_oracles

    return all_oracles()
