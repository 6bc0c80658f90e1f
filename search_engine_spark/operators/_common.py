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

Rounding-mode policy (unified, one rule): the engines natively disagree on
EXACT half-way ties at the 6th decimal — Spark ``F.round`` is HALF_UP (=
half-away-from-zero on BigDecimal), DuckDB ``round`` is half-away-from-zero,
but numpy ``np.round`` and pandas ``.round`` are half-to-even.  Every
numpy/pandas site that feeds a gated comparison, a rank tiebreak, a bucket
id, or a logged value therefore uses :func:`search_engine_spark.numerics.
round_half_away` — half-away-from-zero, the mode Spark and DuckDB already
share — so all three stacks round a tie identically.  (Codec-internal
rounding, e.g. the JPEG quantizer, is exempt: encoder and decoder live in
the same numpy module and only have to agree with each other.)  Defense in
depth on top of the unified mode: (1) rank/tie-break on the ROUNDED value
with an id tiebreak everywhere; (2) keep direct summation forms (not
algebraically expanded ones) in twin paths so the cross-engine float noise
stays ≪ the 5e-7 grid; (3) prefer exactly-representable arithmetic (integer
thresholds, DECIMAL sums, sums-of-ints / powers of two) wherever the
semantics allow, which removes rounding entirely.

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

    Two-phase: ``orderBy(...).limit(n)`` executes as TakeOrderedAndProject —
    a per-partition bounded heap plus driver k-way merge, never a global
    sort.  The rank is then a ``row_number`` window over ONLY the ≤n
    surviving rows.  The window needs a defined partition spec (a bare
    ``lit(0)`` is constant-folded away, resurrecting the "No Partition
    Defined" single-partition-sort plan): ``spark_partition_id()`` over the
    ``coalesce(1)``d slice is 0 for every row but non-foldable, so the
    window hash-partitions the ≤n rows instead of warning about the corpus.
    The single-partition property is coalesce(1)'s documented contract — no
    reliance on monotonically_increasing_id counter internals.
    ``order_cols`` must be a deterministic total order (unique tiebreak),
    or the rank is not reproducible.
    """
    from pyspark.sql import Window

    topped = df.orderBy(*order_cols).limit(n).coalesce(1).withColumn(
        "_rk_part", F.spark_partition_id()
    )
    w = Window.partitionBy("_rk_part").orderBy(*order_cols)
    return (
        topped.withColumn(rank_name, F.row_number().over(w).cast("int"))
        .drop("_rk_part")
    )


# Tokenizer shared by the text/dedup/fulltext operators: lower -> split on
# non-letters -> drop empties.  documents.text is lowercase words + commas,
# so this matches the engine's pinned analyzer (analysis/text.py) on this
# corpus exactly.
def tokens_col(col="text"):
    return F.array_remove(F.split(F.lower(F.col(col)), "[^a-z]+"), "")


TOKENS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# Zero-copy embedding batches for mapInArrow kernels.
#
# ``np.array(list(pdf["embedding"]))`` inside mapInPandas materializes one
# python object + one small ndarray PER ROW before re-packing — measured
# ~300 µs/vector, which dwarfs the actual matmul in every similarity/dedup
# kernel at 10^6+ rows.  mapInArrow hands us the raw Arrow ListArray whose
# values buffer is already the contiguous float32 matrix; reshape is free.
# ---------------------------------------------------------------------------


def iter_id_matrix(batches, id_col: str = "vec_id", emb_col: str = "embedding", dim: int = 64):
    """Yield (ids int64 ndarray, X float32 (n, dim) ndarray) per Arrow batch.

    For use inside ``df.select(id_col, emb_col).mapInArrow(fn, ...)``.
    Requires fixed-length lists (every embedding exactly ``dim`` floats) —
    asserted per batch — and no nulls, which the embeddings table contract
    guarantees.
    """
    import numpy as np

    for rb in batches:
        if rb.num_rows == 0:
            continue
        ids = rb.column(rb.schema.get_field_index(id_col)).to_numpy()
        arr = rb.column(rb.schema.get_field_index(emb_col))
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        if flat.size != rb.num_rows * dim:
            raise ValueError(
                f"ragged embedding batch: {flat.size} values for {rb.num_rows} rows x dim {dim}"
            )
        yield ids.astype(np.int64, copy=False), flat.reshape(rb.num_rows, dim)
