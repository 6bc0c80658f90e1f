"""Benchmark harness — one JSON line for the driver.

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

- ``index_build``      — full inverted-index build over the documents table
                         (the north-star metric; docs/sec derived from it)
- ``search_*``         — BM25 top-k through the engine (sort baseline vs
                         block-max WAND vs prefix autocomplete)
- operator headliners  — one per family (relational agg, sessionization,
                         minhash, knn, quality scoring, declarative BM25)

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "extras": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from search_engine_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # ---- index build over documents (fresh dir every run) ----------------
    from search_engine_spark.index.builder import BuildConfig, build_index

    index_dir = os.path.join(tempfile.gettempdir(), "bench_index")
    shutil.rmtree(index_dir, ignore_errors=True)
    corpus = f"{sf_dir}/documents.parquet"
    n_docs = spark.read.parquet(corpus).count()
    cfg = BuildConfig(block_docs=1024, target_ranges=max(32, n_docs // 4096),
                      min_range_docs=1024, n_partitions=32, waves=1)
    timed("index_build", lambda: build_index(spark, corpus, index_dir, cfg=cfg, id_col="doc_id"))
    extras["index_docs"] = n_docs
    extras["index_docs_per_sec"] = round(n_docs / timings["index_build"], 1)

    # ---- webtext headline: build over a 100k-page Common-Crawl-style corpus
    wt_docs = int(os.environ.get("SPARK_GRAFT_BENCH_WEBTEXT_DOCS", "300000"))
    wt_corpus = os.path.join(tempfile.gettempdir(), f"bench_webtext_{wt_docs}")
    if not os.path.exists(os.path.join(wt_corpus, "part-00000.parquet")):
        from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

        write_webtext_parquet_parallel(wt_corpus, wt_docs, procs=min(16, cpus))
    wt_index = os.path.join(tempfile.gettempdir(), "bench_webtext_index")
    shutil.rmtree(wt_index, ignore_errors=True)
    wt_cfg = BuildConfig(block_docs=1024, target_ranges=max(64, wt_docs // 8192),
                         min_range_docs=2048, n_partitions=32, waves=1)
    timed("webtext_index_build", lambda: build_index(spark, wt_corpus, wt_index, cfg=wt_cfg))
    extras["webtext_docs"] = wt_docs
    extras["webtext_docs_per_sec"] = round(wt_docs / timings["webtext_index_build"], 1)

    from search_engine_spark.query.engine import SearchEngine as _SE

    wt_eng = _SE(spark, wt_index)
    timed("webtext_search_multiterm", lambda: wt_eng.search("cadbury dairy milk", k=10))
    # head-term serving config: WAND-pruned page + Σdf-bounded approx total
    # (the exact disjunctive total decodes every matched term's doc_ids —
    # timed separately as the exact-mode cost)
    timed("webtext_search_head_term", lambda: wt_eng.search(
        "the oil", k=10, force_distributed=True, mode="wand", total_mode="approx"))
    timed("webtext_search_head_term_exact_total", lambda: wt_eng.search(
        "the oil", k=10, force_distributed=True, mode="wand"))
    timed("webtext_search_autocomplete", lambda: wt_eng.search("oi", k=10))

    # ---- engine queries ----------------------------------------------------
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_dir)
    timed("search_topk", lambda: eng.search("scan window merge", k=10))
    timed("search_sort_dist", lambda: eng.search("scan window merge", k=10, mode="sort", force_distributed=True))
    timed("search_wand_dist", lambda: eng.search("scan window merge", k=10, mode="wand", force_distributed=True))
    timed("search_autocomplete", lambda: eng.search("wi", k=10))
    timed("search_conjunctive", lambda: eng.search("scan window", k=10, conjunctive=True))

    # ---- operator headliners ----------------------------------------------
    from search_engine_spark.operators import dedup, events, fulltext, relational, similarity, textstats

    heads = {
        "rel_pricing_summary": relational.pricing_summary,
        "rel_order_quantity_rollup": relational.order_quantity_rollup,
        "ev_sessionize": events.sessionize,
        "txt_quality_scores": textstats.quality_scores,
        "ft_bm25_topk": fulltext.bm25_topk,
        "dd_minhash_signatures": dedup.minhash_signatures,
        "dd_dedup_decisions": dedup.dedup_decisions,
        "dd_simhash": dedup.simhash,
        # serving form: Arrow bucketing kernel (declarative twin is the oracle)
        "dd_embedding_neardup_lsh_kernel": lambda spark, sf_dir: dedup.embedding_neardup_lsh(
            spark, sf_dir, buckets_fn=dedup._emb_band_buckets_arrow
        ),
        "sim_knn_brute": similarity.knn_brute,
        "sim_ann_ivf": similarity.ann_ivf,
        "sim_ann_ivf_kernel": similarity.ivf_topk_arrow,
        "ft_grouped_topk": fulltext.grouped_topk,
    }
    for name, fn in heads.items():
        timed(name, lambda fn=fn: fn(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "index-build + BM25 query + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
