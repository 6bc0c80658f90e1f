"""Checkpoint/resume: a killed build restarts from completed segments.

North-star requirement (BASELINE.json): per-partition lineage rows in the
manifest; a restart skips status='done' partitions and the final index is
identical to an uninterrupted run.
"""

import os

import pytest


def _segment_fingerprint(spark, index_dir):
    """Deterministic digest of the whole segment table."""
    from pyspark.sql import functions as F

    from search_engine_spark.catalog import IndexCatalog

    cat = IndexCatalog(index_dir)
    df = spark.read.parquet(cat.segments)
    return (
        df.select(
            F.sha2(
                F.concat_ws(
                    "|",
                    "term",
                    "sseg",
                    "block_id",
                    "first_doc",
                    "last_doc",
                    "doc_count",
                    F.format_number("max_tf_norm", 12),
                    F.sha2(F.col("postings"), 256),
                ),
                256,
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("fp"),
             F.count("*").alias("n"))
        .collect()[0]
    )


@pytest.mark.slow
def test_kill_and_resume_produces_identical_index(spark, webtext_tiny, tmp_path):
    from search_engine_spark.catalog import IndexCatalog
    from search_engine_spark.index.builder import BuildConfig, build_index

    cfg = BuildConfig(block_docs=64, target_ranges=16, min_range_docs=64, n_partitions=8, waves=4)

    # uninterrupted run
    clean = str(tmp_path / "clean")
    build_index(spark, webtext_tiny, clean, cfg=cfg, run_id="clean")
    fp_clean = _segment_fingerprint(spark, clean)

    # killed after wave 1, then resumed
    broken = str(tmp_path / "broken")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, webtext_tiny, broken, cfg=cfg, run_id="try1", fail_after_wave=1)

    cat = IndexCatalog(broken)
    done_before = cat.completed_partitions()
    assert -1 in done_before, "phase1 must be committed before wave 1"
    done_pids_before = sorted(p for p in done_before if p >= 0)
    assert 0 < len(done_pids_before) < 8, "some but not all partitions done"

    metrics = build_index(spark, webtext_tiny, broken, cfg=cfg, run_id="try2")
    # resume skipped every completed partition
    assert metrics["partitions_skipped"] == len(done_pids_before)
    assert metrics["partitions_built"] == 8 - len(done_pids_before)

    # completed segments were NOT rebuilt: manifest keeps the original run_id
    m = cat.read_manifest().to_pydict()
    for pid, run in zip(m["partition_id"], m["run_id"]):
        if pid in done_pids_before:
            assert run == "try1"

    # final index is identical to the uninterrupted run
    fp_broken = _segment_fingerprint(spark, broken)
    assert fp_broken["n"] == fp_clean["n"]
    assert fp_broken["fp"] == fp_clean["fp"]

    # and it answers queries identically
    from search_engine_spark.query import SearchEngine

    a = SearchEngine(spark, clean).search("milk", k=10).page
    b = SearchEngine(spark, broken).search("milk", k=10).page
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_manifest_append_is_atomic(tmp_path):
    from search_engine_spark.catalog import IndexCatalog

    cat = IndexCatalog(str(tmp_path / "idx"))
    rows = [
        {
            "run_id": "r",
            "partition_id": 1,
            "segment_id": "s",
            "input_split": "x",
            "term_lo": "a",
            "term_hi": "z",
            "postings_count": 10,
            "bytes": 100,
            "status": "done",
        }
    ]
    cat.append_manifest(rows)
    cat.append_manifest(rows * 2)
    m = cat.read_manifest()
    assert m.num_rows == 3
    # no temp files left behind
    assert not [f for f in os.listdir(cat.manifest_dir) if f.endswith(".tmp")]
    assert cat.completed_partitions() == {1}


def test_distributed_vocab_build_identical_to_broadcast(spark, webtext_tiny, tmp_path):
    """dict_budget=0 forces the distributed vocabulary path (shuffle-join
    term ids, id-emitting encoder, post-encode string join); the resulting
    segment table must be byte-identical to the broadcast-dictionary build.
    """
    from search_engine_spark.index.builder import BuildConfig, build_index

    kw = dict(block_docs=64, target_ranges=16, min_range_docs=64, n_partitions=8, waves=2)
    d_bcast = str(tmp_path / "idx_bcast")
    d_dist = str(tmp_path / "idx_dist")
    build_index(spark, webtext_tiny, d_bcast, cfg=BuildConfig(**kw))
    build_index(spark, webtext_tiny, d_dist, cfg=BuildConfig(**kw, dict_budget=0))
    assert _segment_fingerprint(spark, d_bcast) == _segment_fingerprint(spark, d_dist)

    # the distributed index serves queries identically
    from search_engine_spark.query.engine import SearchEngine

    a = SearchEngine(spark, d_bcast).search("oil", k=10, mode="wand")
    b = SearchEngine(spark, d_dist).search("oil", k=10, mode="wand")
    assert list(a.page["doc_id"]) == list(b.page["doc_id"])
    assert a.total == b.total
