"""Streaming == batch parity for the windowed event operators."""

from __future__ import annotations

import os
import shutil

import pytest


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # file-source streams want a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_stream_hourly_rollup_matches_batch(spark, events_dir, tmp_path):
    from search_engine_spark.streaming import (
        run_to_memory,
        stream_events,
        stream_hourly_rollup,
    )

    stream = stream_hourly_rollup(stream_events(spark, events_dir))
    assert stream.isStreaming
    run_to_memory(stream, "hourly_mem", str(tmp_path / "ckpt1"))
    got = spark.sql("SELECT * FROM hourly_mem").toPandas()

    batch = stream_hourly_rollup(spark.read.parquet(events_dir)).toPandas()
    key = ["hour", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(got) == len(batch) > 0
    assert (got["n"].to_numpy() == batch["n"].to_numpy()).all()
    assert (got["sum_value"].to_numpy() == batch["sum_value"].to_numpy()).all()


def test_stateful_asof_matches_batch(spark, events_dir, sf_dir, tmp_path):
    """Custom applyInPandasWithState as-of matcher == the batch as-of join.

    Exercises real GroupState plumbing (state schema, append mode,
    availableNow drain) and pins row-for-row parity with
    events.asof_purchase_view on a finite in-order source.
    """
    from pyspark.sql import functions as F

    from search_engine_spark.operators.events import asof_purchase_view
    from search_engine_spark.streaming import run_to_memory, stateful_asof, stream_events

    stream = stateful_asof(stream_events(spark, events_dir))
    assert stream.isStreaming
    run_to_memory(stream, "asof_mem", str(tmp_path / "ckpt_asof"), output_mode="append")
    got = spark.sql("SELECT * FROM asof_mem").toPandas()

    batch = (
        asof_purchase_view(spark, sf_dir)
        .select(
            "user_id", "purchase_id", "view_id",
            F.unix_micros(F.col("p_ts").cast("timestamp")).alias("p_us"),
            F.unix_micros(F.col("v_ts").cast("timestamp")).alias("v_us"),
        )
        .toPandas()
    )
    key = ["user_id", "purchase_id"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(got) == len(batch) > 0
    for c in ["user_id", "purchase_id", "view_id", "p_us", "v_us"]:
        assert (got[c].to_numpy() == batch[c].to_numpy()).all(), c


def test_stateful_asof_out_of_order_matches_batch(spark, sf_dir, tmp_path):
    """The watermark-delayed variant == the batch as-of join on a source
    whose micro-batches arrive in REVERSE event-time order.

    Files are written newest-events-first with increasing modification
    times and maxFilesPerTrigger=1, so every micro-batch after the first
    delivers events EARLIER than ones already processed — the exact
    condition plain ``stateful_asof`` documents as unsupported.  A
    far-future sentinel row (filtered out of the match logic) advances the
    watermark past all real events so every buffered row matures; flushing
    relies on the EventTimeTimeout wake-ups, since most users have no rows
    in the final batches.
    """
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from search_engine_spark.operators.events import asof_purchase_view
    from search_engine_spark.streaming import run_to_memory, stateful_asof_watermarked

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    pdf = tbl.to_pandas().sort_values("ts", ascending=False).reset_index(drop=True)
    d = tmp_path / "ooo_events"
    d.mkdir()
    n = len(pdf)
    now = time.time()
    chunks = [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]
    for i, ch in enumerate(chunks):
        p = str(d / f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(ch, schema=tbl.schema, preserve_index=False), p)
        os.utime(p, (now + 10 * i, now + 10 * i))
    sentinel = pdf.iloc[[0]].copy()
    sentinel["event_id"] = 10**9
    sentinel["event_type"] = "flush"  # not view/purchase: advances watermark only
    sentinel["ts"] = pdf["ts"].max() + __import__("pandas").Timedelta(days=60)
    p = str(d / "part-sentinel.parquet")
    pq.write_table(pa.Table.from_pandas(sentinel, schema=tbl.schema, preserve_index=False), p)
    os.utime(p, (now + 40, now + 40))

    src = (
        spark.readStream.schema(spark.read.parquet(str(d)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    stream = stateful_asof_watermarked(src, delay="40 days")
    assert stream.isStreaming
    run_to_memory(stream, "asof_ooo_mem", str(tmp_path / "ckpt_ooo"), output_mode="append")
    got = spark.sql("SELECT * FROM asof_ooo_mem").toPandas()

    batch = (
        asof_purchase_view(spark, sf_dir)
        .select(
            "user_id", "purchase_id", "view_id",
            F.unix_micros(F.col("p_ts").cast("timestamp")).alias("p_us"),
            F.unix_micros(F.col("v_ts").cast("timestamp")).alias("v_us"),
        )
        .toPandas()
    )
    key = ["user_id", "purchase_id"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(got) == len(batch) > 0
    for c in ["user_id", "purchase_id", "view_id", "p_us", "v_us"]:
        assert (got[c].to_numpy() == batch[c].to_numpy()).all(), c


def test_session_window_matches_declarative_sessionize(spark, events_dir, sf_dir):
    from search_engine_spark.operators.events import sessionize
    from search_engine_spark.streaming import session_window_counts

    sw = (
        session_window_counts(spark.read.parquet(events_dir))
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    decl = (
        sessionize(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(sw) == len(decl) > 0
    assert (sw["user_id"].to_numpy() == decl["user_id"].to_numpy()).all()
    assert (sw["n_events"].to_numpy() == decl["n_events"].to_numpy()).all()
    assert (
        sw["session_start"].to_numpy() == decl["session_start"].to_numpy()
    ).all()
