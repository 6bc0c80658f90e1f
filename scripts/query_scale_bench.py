"""Query latency at 10^6 documents — the fulltext tier's query-side
scale evidence (BENCH/BASELINE.md §3 measures only a 10^5-doc index).

Builds (or reuses) a 1M-doc webtext index at the chosen parallelism, then
measures the serving query suite: head-term block-max WAND (distributed,
approx and exact total modes), tail multi-term (driver fast path),
autocomplete prefix expansion, and conjunctive intersection.  Each query
runs ``--reps`` times; all walls are reported (first rep carries plan
compilation + cache warmup — the honest cold number), plus the inline
python clock probe so absolutes can be normalized across this host's
frequency swings.

Run one leg per process (fresh JVM per parallelism level, same corpus and
the same on-disk index):

    python scripts/query_scale_bench.py --docs 1000000 --cpus 32 \
        --out BENCH/query_r4_1m_c32.json
    python scripts/query_scale_bench.py --docs 1000000 --cpus 8 \
        --reuse-index --out BENCH/query_r4_1m_c8.json
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


from search_engine_spark.benchutil import clock_probe  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--reuse-index",
        action="store_true",
        help="reuse an existing index dir (the non-build leg of a scaling pair)",
    )
    args = ap.parse_args()

    corpus = f"/tmp/webtext_{args.docs // 1000}k"  # shared with scaling_bench.py
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

        write_webtext_parquet_parallel(corpus, args.docs, procs=16)

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("query_scale", cpus=args.cpus)
    results: dict = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "clock_probe_mips": clock_probe(),
        "queries": {},
    }

    index_dir = f"/tmp/query_scale_idx_{args.docs}"
    if not (args.reuse_index and os.path.exists(index_dir)):
        shutil.rmtree(index_dir, ignore_errors=True)
        cfg = BuildConfig(
            block_docs=1024,
            target_ranges=max(64, args.docs // 8192),
            min_range_docs=2048,
            n_partitions=args.cpus,
            waves=1,
        )
        t0 = time.time()
        build_index(spark, corpus, index_dir, cfg=cfg)
        results["index_build_s"] = round(time.time() - t0, 2)
        results["index_docs_per_sec"] = round(args.docs / results["index_build_s"], 1)

    eng = SearchEngine(spark, index_dir)
    suite = {
        # tail multi-term: Σdf under the driver fast-path budget
        "multiterm_tail": lambda: eng.search("cadbury dairy milk", k=10),
        # head terms: distributed two-phase block-max WAND, approx total
        "head_term_wand": lambda: eng.search(
            "the oil", k=10, force_distributed=True, mode="wand", total_mode="approx"
        ),
        # same, decoding the exact disjunctive total
        "head_term_wand_exact_total": lambda: eng.search(
            "the oil", k=10, force_distributed=True, mode="wand"
        ),
        # head terms through the unpruned sort baseline (the WAND speedup's
        # denominator at this scale)
        "head_term_sort_baseline": lambda: eng.search(
            "the oil", k=10, force_distributed=True, mode="sort"
        ),
        "autocomplete": lambda: eng.search("oi", k=10),
        "conjunctive": lambda: eng.search("the oil", k=10, conjunctive=True),
    }
    for name, fn in suite.items():
        walls = []
        rows = None
        for _ in range(args.reps):
            t0 = time.time()
            res = fn()
            walls.append(round(time.time() - t0, 3))
            rows = len(res.page)
        results["queries"][name] = {
            "walls_s": walls,
            "min_s": min(walls),
            "page_rows": rows,
            "total": res.total,
        }
        print(f"{name}: {walls} rows={rows} total={res.total}", flush=True)

    results["clock_probe_mips_end"] = clock_probe()
    out = args.out or f"BENCH/query_scale_{args.docs}_{args.cpus}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
