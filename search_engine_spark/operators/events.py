"""Event-stream operators over the ``events`` table.

The reference's "streaming" is cron-batch ETL (SURVEY.md §2.C C2); here the
same workloads are declarative Spark plans that run identically in batch or
behind ``readStream`` (the shapes below — tumbling windows, sessionization,
as-of joins — are the standard Structured Streaming operator set; watermark
wiring lives in streaming/, these batch forms are the oracle-checkable core).

Scale notes: sessionization shuffles once on ``user_id`` and every window
function reuses that partitioning; the as-of join is a range join whose right
side is filtered *before* the join so Catalyst pushes the predicate into the
scan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._common import t

# --------------------------------------------------------------------------
# tumbling-window aggregation
# --------------------------------------------------------------------------

def hourly_event_rollup(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


HOURLY_EVENT_ROLLUP_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""

# --------------------------------------------------------------------------
# gap-based sessionization (30-minute inactivity gap)
# --------------------------------------------------------------------------

def sessionize(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # parquet timestamps load as TIMESTAMP_NTZ; go via ltz (UTC session) to epoch
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sessioned = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessioned AS (
  SELECT user_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq,
         ts
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessioned
GROUP BY user_id, session_seq
"""

# --------------------------------------------------------------------------
# top-k per user
# --------------------------------------------------------------------------

def top_events_per_user(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("user_id", "event_id", "event_type", "value", "rk")
    )


TOP_EVENTS_PER_USER_SQL = """
SELECT user_id, event_id, event_type, value, rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id ASC) AS rk
  FROM events
) WHERE rk <= 2
"""

# --------------------------------------------------------------------------
# as-of join: each purchase matched to the latest prior view by that user
# --------------------------------------------------------------------------

def asof_purchase_view(spark, sf_dir):
    """Each purchase matched to the latest prior view by that user.

    Linear plan: one scan of events, one shuffle on ``user_id``, and a
    running ``last(view, ignorenulls)`` over (ts, kind, event_id) — views
    sort before purchases at equal ts so ``v_ts <= p_ts`` ties are included,
    and event_id-ascending makes the running last pick the max view_id among
    equal timestamps (the view_id DESC tiebreak).  Replaces the former
    range-join + row_number form, which fanned every purchase out to ALL
    prior views per user (per-user quadratic).
    """
    e = t(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "purchase"))
    is_view = F.col("event_type") == "view"
    u = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(is_view, F.lit(0)).otherwise(F.lit(1)).alias("kind"),
        F.when(
            is_view, F.struct(F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id"))
        ).alias("vinfo"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("kind"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.withColumn("lv", F.last("vinfo", ignorenulls=True).over(w))
    return (
        out.filter((F.col("kind") == 1) & F.col("lv").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("lv.view_id").alias("view_id"),
            F.col("ts").alias("p_ts"),
            F.col("lv.v_ts").alias("v_ts"),
        )
    )


ASOF_PURCHASE_VIEW_SQL = """
SELECT user_id, purchase_id, view_id, p_ts, v_ts
FROM (
  SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
         p.ts AS p_ts, v.ts AS v_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY v.ts DESC, v.event_id DESC) AS rk
  FROM events p
  JOIN events v ON v.user_id = p.user_id AND v.ts <= p.ts AND v.event_type = 'view'
  WHERE p.event_type = 'purchase'
) WHERE rk = 1
"""

# --------------------------------------------------------------------------
# semi-structured extraction from props (reference stores raw request JSON in
# its log collections, app.py:62-64)
# --------------------------------------------------------------------------

def props_key_buckets(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r"([0-9]+)", 1).cast("long")
    return (
        e.select((k % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"))
    )


PROPS_KEY_BUCKETS_SQL = """
SELECT TRY_CAST(NULLIF(regexp_extract(props, '([0-9]+)', 1), '') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n
FROM events
GROUP BY 1
"""


QUERIES = {
    "ev_hourly_rollup": hourly_event_rollup,
    "ev_sessionize": sessionize,
    "ev_top_per_user": top_events_per_user,
    "ev_asof_purchase_view": asof_purchase_view,
    "ev_props_key_buckets": props_key_buckets,
}

ORACLES = {
    "ev_hourly_rollup": HOURLY_EVENT_ROLLUP_SQL,
    "ev_sessionize": SESSIONIZE_SQL,
    "ev_top_per_user": TOP_EVENTS_PER_USER_SQL,
    "ev_asof_purchase_view": ASOF_PURCHASE_VIEW_SQL,
    "ev_props_key_buckets": PROPS_KEY_BUCKETS_SQL,
}
