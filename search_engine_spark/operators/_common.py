"""Shared helpers for the operator library.

Every gated operator comes in two forms that must agree value-for-value:

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (registered in the
  module's ``QUERIES`` dict), and
- an ANSI-SQL oracle string runnable by DuckDB on the same parquet tables
  (registered in ``ORACLES``).

Float discipline (the driver hashes values):

- money/quantity sums go through DECIMAL so the aggregate is exact and
  order-independent, then one final cast to double;
- per-row arithmetic keeps the identical operand order on both sides (IEEE
  doubles are deterministic given the same expression tree);
- genuinely order-sensitive float reductions (dot products summed by a
  group-by) are rounded to 6 decimals before compare/rank.

Portable string hash: both engines lack a shared native 64-bit hash
(Spark ``hash``/``xxhash64`` != DuckDB ``hash``), so hashed operators use the
first 15 hex digits of md5 as a 60-bit integer — ``conv(substr(md5(x),1,15),
16,10)`` in Spark, ``cast('0x' || substr(md5(x),1,15) as bigint)`` in DuckDB.
At cluster scale the production path swaps in ``xxhash64`` (cheaper, JVM
native); the md5 form exists so the oracle can verify the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def md5_long(col):
    """60-bit integer from md5 hex — Spark side of the portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MD5_LONG_SQL = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def dec_sum(col, scale: int = 2):
    """Exact, order-independent sum of a money-like double -> double."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


def dec_sum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def ranked_topk(df, order_cols, n: int, rank_name: str = "rk"):
    """Scale-safe global top-n with a dense 1-based rank column.

    ``orderBy(...).limit(n)`` executes as TakeOrderedAndProject — a
    per-partition bounded heap plus driver k-way merge, never a global sort.
    The rank window then runs over only the n surviving rows;
    ``partitionBy(lit(0))`` keeps the window's partition spec non-empty so no
    single-partition global-sort WindowExec is ever planned (the all-rows
    "partition" is the already-bounded top-n, which is the point).
    ``order_cols`` must be a deterministic total order (unique tiebreak).
    """
    topped = df.orderBy(*order_cols).limit(n).coalesce(1).sortWithinPartitions(*order_cols)
    # positional rank on the single bounded partition: monotonically_
    # increasing_id is the partition-local row counter, so on partition 0 of
    # a deterministically sorted ≤n-row slice it is exactly 0..n-1
    return topped.withColumn(rank_name, (F.monotonically_increasing_id() + 1).cast("int"))


# Tokenizer shared by the text/dedup/fulltext operators: lower -> split on
# non-letters -> drop empties.  documents.text is lowercase words + commas,
# so this matches the engine's pinned analyzer (analysis/text.py) on this
# corpus exactly.
def tokens_col(col="text"):
    return F.array_remove(F.split(F.lower(F.col(col)), "[^a-z]+"), "")


TOKENS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')"
