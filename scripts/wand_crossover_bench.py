"""WAND-vs-sort crossover at 10^6 documents, and the auto-dispatch check.

Round-4 measured WAND *losing* to the sort baseline on "the oil" at 1M docs
(BENCH/query_r4_1m_c32.json: 2.48 s vs 1.66 s) — the one `weak` finding.
This bench maps WHERE each strategy wins and verifies that the metadata-only
cost model (`predict_wand_decode` + mode="auto") picks the right side:

- dense-dense ("the oil"): both terms appear in every doc-range at similar
  bounds; θ never clears the range bounds, nothing prunes, and WAND pays an
  extra Spark job for no benefit — sort must win and auto must choose sort.
- rare-dominated ("the cadbury", "the of in cadbury"): θ is set by the rare
  term's best docs and exceeds every stopword-only range bound plus most
  ranges' cadbury bounds; phase 2 skips almost all candidate postings —
  WAND must win and auto must choose wand.

Each (query, mode) runs --reps times (all walls reported; min = the
throttle-smoothed number).  Rank identity across sort/wand/auto pages is
asserted per query — the dispatch may never change results.

Usage:
    python scripts/wand_crossover_bench.py --docs 1000000 --cpus 32 \
        --out BENCH/wand_crossover_r5.json
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

QUERIES = {
    "dense_dense": "the oil",
    "mid_rare": "the dairy",
    "rare_dominated": "the cadbury",
    "multi_stop_rare": "the of in cadbury",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    corpus = f"/tmp/webtext_{args.docs // 1000}k"  # shared with the other scale benches
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

        write_webtext_parquet_parallel(corpus, args.docs, procs=16)

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("wand_crossover", cpus=args.cpus)
    out: dict = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "k": args.k,
        "clock_probe_mips": clock_probe(),
        "queries": {},
    }

    index_dir = f"/tmp/query_scale_idx_{args.docs}"
    if not os.path.exists(os.path.join(index_dir, "corpus_stats.json")):
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
        out["index_build_s"] = round(time.time() - t0, 2)

    eng = SearchEngine(spark, index_dir)

    def run(kw, mode):
        walls, page, total, dispatch = [], None, None, None
        for _ in range(args.reps):
            t0 = time.time()
            res = eng.search(
                kw, k=args.k, mode=mode, force_distributed=True,
                total_mode="approx",
            )
            walls.append(round(time.time() - t0, 3))
            page = [(int(d), round(float(s), 6)) for d, s in
                    zip(res.page["doc_id"], res.page["score"])]
            total = res.total
            if mode == "auto":
                dispatch = dict(eng.last_dispatch or {})
        rec = {"walls_s": walls, "min_s": min(walls), "total": total}
        if dispatch:
            rec["dispatch"] = dispatch
        return rec, page

    for name, kw in QUERIES.items():
        qrec = {"keyword": kw}
        pages = {}
        for mode in ("sort", "wand", "auto"):
            rec, page = run(kw, mode)
            qrec[mode] = rec
            pages[mode] = page
        assert pages["sort"] == pages["wand"] == pages["auto"], (
            f"page mismatch across modes for {kw}"
        )
        qrec["pages_identical"] = True
        qrec["wand_over_sort_ratio"] = round(
            qrec["wand"]["min_s"] / qrec["sort"]["min_s"], 3
        )
        qrec["auto_picked"] = qrec["auto"].get("dispatch", {}).get("mode")
        best = "wand" if qrec["wand"]["min_s"] < qrec["sort"]["min_s"] else "sort"
        qrec["auto_picked_winner"] = qrec["auto_picked"] == best
        out["queries"][name] = qrec
        print(
            f"{name:18s} sort={qrec['sort']['min_s']:.3f}s "
            f"wand={qrec['wand']['min_s']:.3f}s auto={qrec['auto']['min_s']:.3f}s "
            f"picked={qrec['auto_picked']} (winner={best})",
            file=sys.stderr,
        )

    out["clock_probe_mips_end"] = clock_probe()
    js = json.dumps(out)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")


if __name__ == "__main__":
    main()
