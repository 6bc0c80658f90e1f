"""Windowed / sessionized streaming aggregations over the events schema.

Batch/stream parity by construction: each builder takes ANY events DataFrame
(static or streaming) and returns the same logical plan, so the pytest
contract is "streaming result over a finite source == batch result".

Scale notes: watermark + tumbling window is the canonical bounded-state
shape; session windows use Spark's native ``session_window`` (gap-merged
state store sessions) rather than a hand-rolled stateful UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of the events table (schema inferred from a static
    read — streaming sources need an explicit schema)."""
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def stream_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window counts+sums; watermark bounds streaming state."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-merged session windows per user (native session_window state)."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", "1 hour")
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def run_to_memory(df: DataFrame, name: str, checkpoint_dir: str):
    """Drain a finite streaming aggregation into an in-memory table."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
