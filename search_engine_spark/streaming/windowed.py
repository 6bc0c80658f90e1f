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


def stateful_asof(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user as-of purchase->view matcher via
    ``applyInPandasWithState`` — the streaming analog of the batch
    ``events.asof_purchase_view`` (each purchase matched to the latest
    prior view by that user).

    Per-user ``GroupState`` = (epoch-micros, view_id) of the latest view,
    carried across micro-batches with no timeout (at scale: a TTL timeout
    bounds state for inactive users).  Within a batch, rows process in
    (ts, kind, event_id) order — exactly the batch operator's running-last
    window order — so a finite in-order source reproduces the batch result
    row-for-row (pinned by ``test_stateful_asof_matches_batch``).  Like any
    event-time as-of over streams, cross-batch correctness assumes the
    source delivers batches in event-time order (file sources listing
    chronologically named files do); ``stateful_asof_watermarked`` below is
    the watermark-delayed emit variant that drops that assumption.

    Timestamps flow as epoch micros (long) so the operator is agnostic to
    TIMESTAMP vs TIMESTAMP_NTZ sources.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        user_id = int(key[0])
        last = tuple(state.get) if state.exists else None
        # a group's micro-batch arrives as an ITERATOR of Arrow chunks
        # (split at arrow.maxRecordsPerBatch) in no guaranteed order —
        # concatenate first, sort ONCE, then scan; sorting per chunk would
        # process a later-chunk view after an earlier-chunk purchase and
        # silently break batch parity past ~100k rows per user per batch
        parts = [p for p in pdfs if len(p)]
        out = []
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            pdf = pdf[pdf["event_type"].isin(["view", "purchase"])].copy()
            if len(pdf):
                pdf["kind"] = (pdf["event_type"] == "purchase").astype(int)
                # pin ns resolution before the epoch cast: pandas may deliver
                # datetime64[us] depending on the Arrow conversion, and a bare
                # int64 cast would then yield micros (so //1000 -> millis)
                pdf["us"] = (
                    pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                    // 1000
                )
                pdf = pdf.sort_values(["us", "kind", "event_id"])
                for us, eid, kind in zip(pdf["us"], pdf["event_id"], pdf["kind"]):
                    if kind == 0:
                        last = (int(us), int(eid))
                    elif last is not None:
                        out.append((user_id, int(eid), last[1], int(us), last[0]))
        if last is not None:
            state.update(last)
        yield pd.DataFrame(
            out, columns=["user_id", "purchase_id", "view_id", "p_us", "v_us"]
        )

    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, purchase_id long, view_id long, p_us long, v_us long",
            stateStructType="v_us long, view_id long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_asof_watermarked(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Out-of-order-hardened as-of matcher: the watermark-delayed emit
    variant of ``stateful_asof``.

    ``stateful_asof`` assumes micro-batches arrive in event-time order;
    this variant drops that assumption.  Every (view|purchase) row is
    BUFFERED in per-user ``GroupState`` and only rows at or below the
    event-time watermark (max event time seen − ``delay``) are finalized —
    processed in the batch operator's (ts, kind, event_id) order — so
    arrivals shuffled across micro-batches by up to ``delay`` still emit
    exactly the batch result (``test_stateful_asof_out_of_order_matches_
    batch`` drives reverse-chronological files).  Rows later than the
    watermark are dropped by Spark upstream, the standard bounded-lateness
    contract.

    Buffered users register an ``EventTimeTimeout`` at the earliest buffered
    timestamp, so maturity is driven by watermark advance even in batches
    where the user has no new rows (including the no-data batch a finite
    source runs after its last file).  State per user = last matured view +
    the not-yet-matured tail — O(rows inside the lateness window), the
    minimum any bounded-disorder as-of can hold.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark("ts", delay)

    def fn(key, pdfs, state):
        import pandas as pd

        user_id = int(key[0])
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            v_us, view_id, b_us, b_id, b_kind = state.get
            last = (int(v_us), int(view_id)) if int(view_id) >= 0 else None
            buf = list(zip(b_us, b_kind, b_id))
        else:
            last, buf = None, []
        parts = [p for p in pdfs if len(p)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            pdf = pdf[pdf["event_type"].isin(["view", "purchase"])].copy()
            if len(pdf):
                pdf["kind"] = (pdf["event_type"] == "purchase").astype(int)
                pdf["us"] = (
                    pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                    // 1000
                )
                buf.extend(zip(pdf["us"], pdf["kind"], pdf["event_id"]))
        buf.sort()  # (us, kind, event_id): views before purchases at equal ts
        out, rest = [], []
        for us, kind, eid in buf:
            if us > wm_us:
                rest.append((us, kind, eid))
                continue
            if kind == 0:
                last = (int(us), int(eid))
            elif last is not None:
                out.append((user_id, int(eid), last[1], int(us), last[0]))
        lv_us, lv_id = last if last is not None else (0, -1)
        state.update(
            (
                lv_us,
                lv_id,
                [int(r[0]) for r in rest],
                [int(r[2]) for r in rest],
                [int(r[1]) for r in rest],
            )
        )
        if rest:
            # wake this user when the earliest buffered row matures (must be
            # strictly ahead of the current watermark per the API contract)
            state.setTimeoutTimestamp(max(wm_us // 1000 + 1, rest[0][0] // 1000))
        yield pd.DataFrame(
            out, columns=["user_id", "purchase_id", "view_id", "p_us", "v_us"]
        )

    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, purchase_id long, view_id long, p_us long, v_us long",
            stateStructType=(
                "v_us long, view_id long, buf_us array<long>, "
                "buf_id array<long>, buf_kind array<int>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_memory(df: DataFrame, name: str, checkpoint_dir: str, output_mode: str = "complete"):
    """Drain a finite streaming query into an in-memory table.

    ``complete`` for streaming aggregations; ``append`` for stateful
    row-emitting operators (``applyInPandasWithState``).
    """
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
