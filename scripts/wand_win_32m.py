"""The WAND-win experiment with cluster-shaped range sizing.

BENCH §3c measures WAND's cost as FIXED overhead (per-range metadata +
kernel dispatch, ~2.2 s at ~1000 ranges) plus a ~3x per-posting decode
premium — so scaling docs at a FIXED range_docs (ranges grow linearly)
can never reach the win regime: the fixed term grows with the corpus.
The variable a cluster operator actually scales is ``range_docs``: hold
the range COUNT at the 8M experiment's ~976 while each range carries the
extra postings.  Then a head-term disjunction's candidate postings clear
the dispatch rule's fixed-cost gap against the same ~2.2 s fixed
overhead — the regime the fitted cost model predicts WAND first wins,
measured here with the interleaved A/B protocol instead of assumed.

The run that produced BENCH/sf_wand_ab_24m.json (§3c-2) used 24M docs /
range_docs=24576 — a 32M build exceeds this sandbox's disk at the
token-aggregation shuffle (measured: 45 GB blockmgr against 52 GB free);
24M peaks at 42.5 GB transient with 4 waves + 60 s periodic GC and
clears the crossover regime (25.4M candidates on "the oil" vs the ~21M
break-even).

    python scripts/wand_win_32m.py --docs 24000000 --range-docs 24576 \
        --out BENCH/sf_wand_ab_24m.json
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

    # derived (doc_id, url, text) corpus: the fixture's html column is ~half
    # the bytes and redundant once text is present, and a pre-assigned
    # doc_id (id_col) skips the rank join — at 32M docs (> the 20M
    # broadcast-join ceiling) that join would shuffle the full corpus text,
    # which together with the encode shuffle exceeds this sandbox's disk.
    # Files are written per-process over disjoint row ranges, so doc_id is
    # file_offset + row_index — computed streaming with pyarrow, no Spark.
    corpus = f"/tmp/webtext{args.docs // 1_000_000}m_idcorp"
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        # slice an existing LARGER id-corpus when the target is a whole-file
        # prefix of it: files hold disjoint contiguous doc_id ranges, so the
        # first k files ARE the first k*per docs — hardlinks, zero copy
        import glob as _glob
        import re as _re

        for cand in sorted(_glob.glob("/tmp/webtext*m_idcorp"), reverse=True):
            m = _re.match(r".*webtext(\d+)m_idcorp$", cand)
            if not m or cand == corpus:
                continue
            cdocs = int(m.group(1)) * 1_000_000
            parts = sorted(os.listdir(cand))
            if cdocs <= args.docs or cdocs % len(parts):
                continue
            per = cdocs // len(parts)
            if args.docs % per:
                continue
            os.makedirs(corpus, exist_ok=True)
            for p in parts[: args.docs // per]:
                os.link(os.path.join(cand, p), os.path.join(corpus, p))
            print(f"corpus: linked {args.docs // per} files from {cand}",
                  flush=True)
            break
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

        import pyarrow as pa
        import pyarrow.parquet as pq

        raw = f"/tmp/webtext_{args.docs // 1000}k_raw"
        t0 = time.time()
        write_webtext_parquet_parallel(raw, args.docs, procs=16)
        os.makedirs(corpus, exist_ok=True)
        per = -(-args.docs // 16)
        for i in range(16):
            pf = pq.ParquetFile(os.path.join(raw, f"part-{i:05d}.parquet"))
            writer, off = None, i * per
            for batch in pf.iter_batches(batch_size=100_000, columns=["url", "text"]):
                t = pa.table({
                    "doc_id": pa.array(range(off, off + batch.num_rows), pa.int64()),
                    "url": batch.column(0), "text": batch.column(1)})
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(corpus, f"part-{i:05d}.parquet"),
                        t.schema, compression="snappy")
                writer.write_table(t)
                off += batch.num_rows
            writer.close()
        shutil.rmtree(raw)
        print(f"corpus gen: {time.time() - t0:.0f}s", flush=True)

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.session import get_spark

    index_dir = f"/tmp/wand_win_idx_{args.docs}"
    build_s = None
    if not (args.reuse_index and os.path.exists(
            os.path.join(index_dir, "corpus_stats.json"))):
        shutil.rmtree(index_dir, ignore_errors=True)
        # aggressive periodic driver GC so each wave's finished shuffle files
        # are reclaimed before the next wave writes its own — without it the
        # ContextCleaner only reacts to incidental GCs and four waves'
        # shuffles can coexist on disk (measured: 28 GB blockmgr at death on
        # the first, disk-limited attempt)
        spark = get_spark(
            "wand_win_build", cpus=args.cpus,
            extra_conf={"spark.cleaner.periodicGC.interval": "60s"},
        )
        cfg = BuildConfig(
            block_docs=1024,
            target_ranges=max(64, args.docs // args.range_docs),
            min_range_docs=args.range_docs,
            n_partitions=args.cpus,
            waves=4,  # quarter the per-wave encode shuffle (disk headroom)
        )
        t0 = time.time()
        build_index(spark, corpus, index_dir, cfg=cfg, id_col="doc_id")
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
