"""Phrase search at 10^6 documents — scale evidence for the positional path.

Builds (or reuses) a POSITIONAL 1M-doc webtext index, then measures exact-
phrase BM25 queries: a head phrase (both terms in the corpus head — the
worst case: every candidate block of both terms decodes postings AND
positions) and tail phrases, each on the engine's automatic path and with
``force_distributed=True`` (the sseg-keyed kernel).  Phrases are drawn
deterministically from corpus documents so they genuinely match.

One leg per process, same on-disk index:

    python scripts/phrase_scale_bench.py --docs 1000000 --cpus 32 \
        --out BENCH/phrase_r4_1m_c32.json
    python scripts/phrase_scale_bench.py --docs 1000000 --cpus 8 \
        --reuse-index --out BENCH/phrase_r4_1m_c8.json
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
    ap.add_argument("--reuse-index", action="store_true")
    args = ap.parse_args()

    corpus = f"/tmp/webtext_{args.docs // 1000}k"  # shared with scaling_bench.py
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

        write_webtext_parquet_parallel(corpus, args.docs, procs=16)

    from search_engine_spark.analysis.text import tokenize
    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("phrase_scale", cpus=args.cpus)
    results: dict = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "clock_probe_mips": clock_probe(),
        "queries": {},
    }

    index_dir = f"/tmp/phrase_scale_idx_{args.docs}"
    if not (args.reuse_index and os.path.exists(index_dir)):
        shutil.rmtree(index_dir, ignore_errors=True)
        cfg = BuildConfig(
            block_docs=1024,
            target_ranges=max(64, args.docs // 8192),
            min_range_docs=2048,
            n_partitions=args.cpus,
            waves=1,
            positions=True,
        )
        t0 = time.time()
        build_index(spark, corpus, index_dir, cfg=cfg)
        results["positional_build_s"] = round(time.time() - t0, 2)
        results["positional_docs_per_sec"] = round(
            args.docs / results["positional_build_s"], 1
        )
        seg = os.path.join(index_dir, "segments")
        results["segment_bytes"] = sum(
            os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(seg) for f in fs
        )

    # deterministic phrases from real doc text; find a doc where the head
    # term 'the' is followed by another head-ish token -> head-phrase case
    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(corpus, "part-00000.parquet"), columns=["text"])
    texts = part.column("text").to_pylist()
    head_phrase = None
    for txt in texts[:500]:
        toks = tokenize(txt)
        for i, tk in enumerate(toks[:-1]):
            if tk == "the" and toks[i + 1] == "oil":
                head_phrase = "the oil"
                break
        if head_phrase:
            break
    if head_phrase is None:  # fall back: any bigram starting with 'the'
        for txt in texts[:50]:
            toks = tokenize(txt)
            for i, tk in enumerate(toks[:-1]):
                if tk == "the":
                    head_phrase = f"the {toks[i + 1]}"
                    break
            if head_phrase:
                break
    tail_bigram = " ".join(tokenize(texts[7])[3:5])
    tail_trigram = " ".join(tokenize(texts[23])[10:13])
    # head+rare: 'the' followed by a Zipf-tail token — the sseg-eligibility
    # pruning case (the rare term's ssegs bound the head term's decode)
    head_rare = None
    for txt in texts[:2000]:
        toks = tokenize(txt)
        for i, tk in enumerate(toks[:-1]):
            if tk == "the" and len(toks[i + 1]) >= 7:
                head_rare = f"the {toks[i + 1]}"
                break
        if head_rare:
            break
    results["phrases"] = {
        "head": head_phrase, "tail_bigram": tail_bigram, "tail_trigram": tail_trigram,
        "head_rare": head_rare,
    }

    eng = SearchEngine(spark, index_dir)
    suite = {
        # head phrase: both terms' full candidate sets decode — the
        # positional worst case; auto path will go distributed (Σdf > 2M)
        "phrase_head": lambda: eng.search(head_phrase, k=10, phrase=True),
        "phrase_tail_bigram": lambda: eng.search(tail_bigram, k=10, phrase=True),
        "phrase_tail_bigram_dist": lambda: eng.search(
            tail_bigram, k=10, phrase=True, force_distributed=True
        ),
        "phrase_tail_trigram": lambda: eng.search(tail_trigram, k=10, phrase=True),
        # head term + rare term: Σdf forces the distributed path, but the
        # sseg-eligibility semi-join bounds the decode by the RARE term
        "phrase_head_rare": lambda: eng.search(head_rare, k=10, phrase=True),
        # reference point: the same head terms as a disjunctive WAND query
        "head_terms_wand_for_reference": lambda: eng.search(
            head_phrase, k=10, force_distributed=True, mode="wand",
            total_mode="approx",
        ),
    }
    for name, fn in suite.items():
        walls, rows, total = [], None, None
        for _ in range(args.reps):
            t0 = time.time()
            res = fn()
            walls.append(round(time.time() - t0, 3))
            rows, total = len(res.page), res.total
        results["queries"][name] = {
            "walls_s": walls, "min_s": min(walls), "page_rows": rows, "total": total,
        }
        print(f"{name}: {walls} rows={rows} total={total}", flush=True)

    results["clock_probe_mips_end"] = clock_probe()
    out = args.out or f"BENCH/phrase_scale_{args.docs}_{args.cpus}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
