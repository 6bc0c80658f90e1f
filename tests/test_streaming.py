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
