"""Multi-field index at 10^6 documents — scale evidence for the round-5
field machinery (per-field postings, compound clauses, field-scoped fuzzy
and phrase).

Derives a (title = first 8 tokens, body = rest) two-field corpus from the
shared 1M webtext fixture, builds a positional field_cols index, and
measures the compound serving surface: should over both fields on a head
term, the retail must+should shape, a field-scoped fuzzy clause, and a
field-scoped head-bigram phrase.  The claim under test: fields ride the
existing machinery as key prefixes — the build pays one extra token-stream
column and the queries pay ordinary disjunction/phrase costs, no new
shuffle shapes.

    python scripts/multifield_scale_bench.py --docs 1000000 --cpus 32 \
        --out BENCH/multifield_r5_1m.json
    ... --reuse-index
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

TITLE_LEN = 8


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

    from pyspark.sql import functions as F

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("mf_scale", cpus=args.cpus)
    results: dict = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "clock_probe_mips": clock_probe(),
        "queries": {},
    }

    mf_corpus = f"/tmp/webtext_mf_{args.docs // 1000}k"
    if not os.path.exists(os.path.join(mf_corpus, "_SUCCESS")):
        from search_engine_spark.analysis.text import _TOKEN_CHARS

        toks = F.filter(
            F.split(F.lower("text"), f"[^{_TOKEN_CHARS}]+"), lambda x: x != ""
        )
        (
            spark.read.parquet(corpus)
            .withColumn("tokens", toks)
            .select(
                "url",
                F.array_join(F.slice("tokens", 1, TITLE_LEN), " ").alias("title"),
                F.array_join(
                    F.expr(
                        f"slice(tokens, {TITLE_LEN + 1}, "
                        f"greatest(size(tokens) - {TITLE_LEN}, 0))"
                    ),
                    " ",
                ).alias("body"),
            )
            .write.mode("overwrite")
            .parquet(mf_corpus)
        )

    index_dir = f"/tmp/mf_scale_idx_{args.docs}"
    if not (args.reuse_index and os.path.exists(index_dir)):
        shutil.rmtree(index_dir, ignore_errors=True)
        cfg = BuildConfig(
            block_docs=1024,
            target_ranges=max(64, args.docs // 8192),
            min_range_docs=2048,
            n_partitions=args.cpus,
            waves=1,
            field_cols=("title", "body"),
            positions=True,
        )
        t0 = time.time()
        build_index(spark, mf_corpus, index_dir, cfg=cfg)
        results["index_build_s"] = round(time.time() - t0, 2)
        results["index_docs_per_sec"] = round(args.docs / results["index_build_s"], 1)

    eng = SearchEngine(spark, index_dir)
    results["fields"] = {
        f: {"doc_count": int(s["doc_count"]), "avgdl": round(float(s["avgdl"]), 2)}
        for f, s in eng.fields.items()
    }
    suite = {
        # head term as a should over BOTH fields (the reference's flagship
        # single-term shape, at 10^6 docs)
        "mf_should_head": lambda: eng.search_fields(
            should=[("title", "the"), ("body", "the")], k=10
        ),
        # retail must+should: title must-match + body should
        "mf_must_should": lambda: eng.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10
        ),
        # field-scoped fuzzy clause (transpositions on)
        "mf_fuzzy_clause": lambda: eng.search_fields(
            should=[{"field": "body", "query": "teh", "kind": "fuzzy",
                     "transpositions": True}], k=10
        ),
        # field-scoped phrase over a head bigram
        "mf_field_phrase": lambda: eng.search_field_phrase("body", "the the", k=10),
    }
    for name, fn in suite.items():
        walls = []
        res = None
        for _ in range(args.reps):
            t0 = time.time()
            res = fn()
            walls.append(round(time.time() - t0, 3))
        results["queries"][name] = {
            "walls_s": walls,
            "min_s": min(walls),
            "page_rows": len(res.page),
            "total": int(res.total),
        }
        print(f"{name}: {walls} rows={len(res.page)} total={res.total}", flush=True)

    # compound WAND vs sort (the single-field crossover protocol, §3c, on
    # pure-should compound shapes): pages must be identical, auto must pick
    # the measured winner, and the rare-dominated shape is where pruning can
    # win once the corpus clears the crossover scale
    wand_shapes = {
        "dense_dense": [("title", "the"), ("body", "the")],
        "rare_dominated": [("title", "cadbury"), ("body", "the")],
    }
    results["wand"] = {}
    for name, should in wand_shapes.items():
        legs = {}
        pages = {}
        for m in ("sort", "wand"):
            walls = []
            res = None
            for _ in range(args.reps):
                t0 = time.time()
                res = (
                    eng.search_fields(should=should, k=10, mode=m)
                    if m == "wand"
                    else eng.search_fields(should=should, k=10, force_distributed=True)
                )
                walls.append(round(time.time() - t0, 3))
            legs[m] = {"walls_s": walls, "min_s": min(walls), "total": int(res.total)}
            pages[m] = [(int(d), round(float(s), 9))
                        for d, s in zip(res.page["doc_id"], res.page["score"])]
        auto = eng.search_fields(should=should, k=10, mode="auto")
        pages["auto"] = [(int(d), round(float(s), 9))
                         for d, s in zip(auto.page["doc_id"], auto.page["score"])]
        ratio = legs["wand"]["min_s"] / legs["sort"]["min_s"]
        results["wand"][name] = {
            **legs,
            "pages_identical": pages["sort"] == pages["wand"] == pages["auto"],
            "wand_over_sort_ratio": round(ratio, 3),
            "auto_mode": eng.last_dispatch["mode"],
            "auto_picked_winner": eng.last_dispatch["mode"]
            == ("wand" if ratio < 1.0 else "sort"),
        }
        print(f"wand/{name}: sort={legs['sort']['min_s']} wand={legs['wand']['min_s']} "
              f"auto={eng.last_dispatch['mode']} identical={results['wand'][name]['pages_identical']}",
              flush=True)

    results["clock_probe_mips_end"] = clock_probe()
    out = args.out or f"BENCH/multifield_scale_{args.docs}_{args.cpus}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
