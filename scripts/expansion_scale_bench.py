"""Expansion-surface latency at 10^6 documents — scale evidence for the
round-5 query surfaces (transposition-aware fuzzy, phonetic) alongside the
round-4 plain-fuzzy numbers (BENCH/fuzzy_r4_1m.json).

Each surface has two costs at scale: the COLD dictionary expansion (a scan
over the cached ~50k-term dictionary: banded DP for fuzzy/damerau, one-time
Soundex key array + mask for phonetic — both memoized afterward) and the
SERVE of the expanded disjunction (ordinary posting traffic; heavy when the
expansion reaches a head term, e.g. 'teh'->'the' matches most of the
corpus).  The round-4 artifact showed 'teh' expanding to NOTHING under
plain Levenshtein; this measures the same query with transpositions on —
the expansion now lands on the corpus's heaviest term, so the interesting
number is that the serve cost equals an ordinary head-term query, not an
expansion penalty.

    python scripts/expansion_scale_bench.py --docs 1000000 --cpus 32 \
        --out BENCH/expansion_r5_1m.json            # builds the index
    ... --reuse-index                               # reuse a prior build
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

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("expansion_scale", cpus=args.cpus)
    results: dict = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "clock_probe_mips": clock_probe(),
        "surfaces": {},
    }

    index_dir = f"/tmp/query_scale_idx_{args.docs}"  # shared with query_scale_bench
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

    eng = SearchEngine(spark, index_dir)
    results["n_dict_terms"] = int(len(eng._terms_arr)) if eng._terms_arr is not None else None

    def expansions(surface, qterms):
        out = {}
        for qt in qterms:
            if surface == "fuzzy":
                out[qt] = len(eng.expand_fuzzy(qt, 1))
            elif surface == "damerau":
                out[qt] = len(eng.expand_fuzzy(qt, 1, transpositions=True))
            else:
                out[qt] = len(eng.expand_phonetic(qt))
        return out

    suite = {
        # round-4 continuity: plain Levenshtein finds nothing for 'teh'
        "fuzzy_teh": ("fuzzy", ["teh"], lambda: eng.search("teh", k=10, fuzzy=1)),
        # the same typo with the Lucene-default transpositions: lands on the
        # corpus head term — serve cost is an ordinary head-term query
        "damerau_teh": ("damerau", ["teh"], lambda: eng.search(
            "teh", k=10, fuzzy=1, fuzzy_transpositions=True)),
        # a tail-term swap typo: tiny expansion, tiny serve
        "damerau_tail_swap": ("damerau", ["vubbaa"], lambda: eng.search(
            "vubbaa", k=10, fuzzy=1, fuzzy_transpositions=True)),
        # phonetic on a head-term typo: key-equal group of 'the'
        "phonetic_teh": ("phonetic", ["teh"], lambda: eng.search(
            "teh", k=10, phonetic=True)),
        # phonetic tail: the O(V) one-time key array is already built by the
        # previous query — this measures the memoized steady state
        "phonetic_tail": ("phonetic", ["vubaba"], lambda: eng.search(
            "vubaba", k=10, phonetic=True)),
    }
    for name, (surface, qterms, fn) in suite.items():
        t0 = time.time()
        exp = expansions(surface, qterms)
        expand_cold = round(time.time() - t0, 3)
        walls = []
        res = None
        for _ in range(args.reps):
            t0 = time.time()
            res = fn()
            walls.append(round(time.time() - t0, 3))
        results["surfaces"][name] = {
            "expansions": exp,
            "expand_s_cold": expand_cold,
            "walls_s": walls,
            "total": int(res.total),
        }
        print(f"{name}: expand={expand_cold}s {exp} walls={walls} "
              f"total={res.total}", flush=True)

    results["clock_probe_mips_end"] = clock_probe()
    out = args.out or f"BENCH/expansion_scale_{args.docs}_{args.cpus}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
