"""Scale evidence for streaming incremental ingest + compaction at 10^6 docs.

Measures the claims SCALE.md §3b makes from design:

1. **Growth cost is O(batch), not O(corpus)** — per-generation ingest wall
   should stay ~flat as the index grows (generation 4 appends to a 750k-doc
   index for the price of generation 1's append to an empty one).
2. **Ingest total ≈ batch build** — generations don't multiply the cost.
3. **Rank identity at 1M** — engine(incremental) == engine(batch rebuild)
   on head/multi-term queries (waves arrive url-lex-ordered so doc ids
   match the rebuild's lex rank).
4. **Compaction** — wall, segment-file collapse, bound-scale reset, and the
   grown-vs-compacted query latency delta.

Usage: python scripts/ingest_scale_bench.py [--corpus /tmp/webtext_1000k]
       [--gens 4] [--out BENCH/scale_r4_ingest_1m.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def nfiles(d):
    return sum(len(fs) for _, _, fs in os.walk(d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/webtext_1000k")
    ap.add_argument("--gens", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.index.compact import compact_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark
    from search_engine_spark.streaming.ingest import ingest_batch

    spark = get_spark("ingest_scale")
    docs = spark.read.parquet(args.corpus)
    n_docs = docs.count()
    cfg = BuildConfig(
        block_docs=1024, target_ranges=max(64, n_docs // 8192),
        min_range_docs=2048, n_partitions=32, waves=1,
    )
    out: dict = {"corpus": args.corpus, "n_docs": n_docs, "gens": args.gens}

    # url-lex-ordered waves so incremental doc ids equal the rebuild's ranks
    waves_root = f"/tmp/ingest_waves_{n_docs}_{args.gens}"
    if not os.path.exists(os.path.join(waves_root, f"w{args.gens - 1}", "_SUCCESS")):
        from pyspark.sql import Window

        ranked = docs.withColumn(
            "rk", F.row_number().over(Window.orderBy("url")) - 1
        )
        per = -(-n_docs // args.gens)
        for e in range(args.gens):
            # the window's global sort collapses to ONE partition — written
            # as-is each wave would be a single parquet file and every
            # generation's tokenize would run on ~6 input splits (measured:
            # 32 s of a 60 s generation).  Re-spread before writing; wave
            # MEMBERSHIP stays url-lex-ordered, which is all the doc-id
            # contract needs.
            ranked.filter(
                (F.col("rk") >= e * per) & (F.col("rk") < (e + 1) * per)
            ).drop("rk").repartition(16).write.mode("overwrite").parquet(
                os.path.join(waves_root, f"w{e}")
            )

    # batch build (the comparison bar), same session, same cfg
    batch_idx = "/tmp/ingest_scale_batch_idx"
    shutil.rmtree(batch_idx, ignore_errors=True)
    t0 = time.time()
    build_index(spark, args.corpus, batch_idx, cfg=cfg)
    out["batch_build_s"] = round(time.time() - t0, 2)

    # incremental: one generation per wave
    inc_idx = "/tmp/ingest_scale_inc_idx"
    shutil.rmtree(inc_idx, ignore_errors=True)
    gen_walls = []
    gen_phases = []
    for e in range(args.gens):
        wdf = spark.read.parquet(os.path.join(waves_root, f"w{e}"))
        t0 = time.time()
        r = ingest_batch(
            spark, wdf, inc_idx, e, cfg=cfg, expected_docs=n_docs
        )
        gen_walls.append(round(time.time() - t0, 2))
        gen_phases.append(r.phase_sec)
        print(f"gen {e}: {gen_walls[-1]} s, {r.n_docs} docs, "
              f"{r.postings} postings, phases={r.phase_sec}", file=sys.stderr)
    out["gen_walls_s"] = gen_walls
    out["gen_phase_s"] = gen_phases
    out["ingest_total_s"] = round(sum(gen_walls), 2)
    out["ingest_vs_batch_ratio"] = round(out["ingest_total_s"] / out["batch_build_s"], 3)
    out["last_gen_vs_first_ratio"] = round(gen_walls[-1] / gen_walls[0], 3)

    # rank identity at 1M + grown-index query latency
    eng_b = SearchEngine(spark, batch_idx)
    eng_i = SearchEngine(spark, inc_idx)
    out["bound_scale_grown"] = eng_i.bound_scale
    assert eng_i.n_docs == eng_b.n_docs == n_docs
    assert eng_i.avgdl == eng_b.avgdl
    kws = ["cadbury dairy milk", "the oil", "rice"]
    mismatches = 0
    lat = {}
    for kw in kws:
        a = eng_b.search(kw, k=10, mode="wand", force_distributed=True)
        t0 = time.time()
        b = eng_i.search(kw, k=10, mode="wand", force_distributed=True)
        lat[kw] = round(time.time() - t0, 3)
        same = (
            list(a.page["doc_id"]) == list(b.page["doc_id"])
            and list(a.page["score"]) == list(b.page["score"])
            and a.total == b.total
        )
        mismatches += not same
    out["rank_identity_mismatches"] = mismatches
    out["query_latency_grown_s"] = lat

    # compaction
    cmp_idx = "/tmp/ingest_scale_cmp_idx"
    shutil.rmtree(cmp_idx, ignore_errors=True)
    t0 = time.time()
    m = compact_index(spark, inc_idx, cmp_idx)
    out["compact_s"] = round(time.time() - t0, 2)
    out["segment_files"] = {
        "grown": nfiles(os.path.join(inc_idx, "segments")),
        "compacted": nfiles(os.path.join(cmp_idx, "segments")),
    }
    eng_c = SearchEngine(spark, cmp_idx)
    out["bound_scale_compacted"] = eng_c.bound_scale
    lat_c = {}
    for kw in kws:
        a = eng_i.search(kw, k=10, mode="wand", force_distributed=True)
        t0 = time.time()
        b = eng_c.search(kw, k=10, mode="wand", force_distributed=True)
        lat_c[kw] = round(time.time() - t0, 3)
        if not (
            list(a.page["doc_id"]) == list(b.page["doc_id"])
            and list(a.page["score"]) == list(b.page["score"])
        ):
            mismatches += 1
    out["rank_identity_mismatches"] = mismatches
    out["query_latency_compacted_s"] = lat_c

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
