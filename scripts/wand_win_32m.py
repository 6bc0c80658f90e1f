"""The WAND-win experiment at 32M docs with cluster-shaped range sizing.

BENCH §3c measures WAND's cost as FIXED overhead (per-range metadata +
kernel dispatch, ~2.2 s at ~1000 ranges) plus a ~3x per-posting decode
premium — so scaling docs at a FIXED range_docs (ranges grow linearly)
can never reach the win regime: the fixed term grows with the corpus.
The variable a cluster operator actually scales is ``range_docs``: hold
the range COUNT at the 8M experiment's ~1000 while each range carries 4x
the postings.  Then a head-term disjunction has ~34M candidate postings
(clears the dispatch rule's 30M fixed-cost gap) against the same ~2.2 s
fixed overhead — the regime the fitted cost model predicts WAND first
wins, measured here with the interleaved A/B protocol instead of assumed.

    python scripts/wand_win_32m.py --docs 32000000 --out BENCH/sf_wand_ab_32m.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=32_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--range-docs", type=int, default=32_768)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="BENCH/sf_wand_ab_32m.json")
    ap.add_argument("--reuse-index", action="store_true")
    args = ap.parse_args()

    corpus = f"/tmp/webtext_{args.docs // 1000}k"
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

        t0 = time.time()
        write_webtext_parquet_parallel(corpus, args.docs, procs=16)
        print(f"corpus gen: {time.time() - t0:.0f}s", flush=True)

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.session import get_spark

    index_dir = f"/tmp/wand_win_idx_{args.docs}"
    build_s = None
    if not (args.reuse_index and os.path.exists(
            os.path.join(index_dir, "corpus_stats.json"))):
        shutil.rmtree(index_dir, ignore_errors=True)
        spark = get_spark("wand_win_build", cpus=args.cpus)
        cfg = BuildConfig(
            block_docs=1024,
            target_ranges=max(64, args.docs // args.range_docs),
            min_range_docs=args.range_docs,
            n_partitions=args.cpus,
            waves=2,
        )
        t0 = time.time()
        build_index(spark, corpus, index_dir, cfg=cfg)
        build_s = round(time.time() - t0, 1)
        print(f"index build: {build_s}s ({args.docs / build_s:.0f} docs/s)",
              flush=True)
        spark.stop()

    # fresh process-level session for serving (same pattern as the other
    # A/B scripts); sf_wand_ab.py does the interleaved measurement
    rc = subprocess.call([
        sys.executable, os.path.join(REPO, "scripts", "sf_wand_ab.py"),
        "--index", index_dir, "--cpus", str(args.cpus),
        "--reps", str(args.reps), "--out", args.out,
    ])
    if rc == 0 and build_s is not None:
        with open(args.out) as f:
            d = json.load(f)
        d["index_build_s"] = build_s
        d["index_docs_per_sec"] = round(args.docs / build_s, 1)
        d["range_docs"] = args.range_docs
        with open(args.out, "w") as f:
            json.dump(d, f, indent=2)
    sys.exit(rc)


if __name__ == "__main__":
    main()
