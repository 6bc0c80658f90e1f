"""Doc-values range/equals filter clauses at 10^6 documents — scale evidence.

Builds the two-field (title/body) index over the SAME derived 1M corpus as
multifield_scale_bench.py, now with the (lang, n_chars) doc-values sidecar
(`BuildConfig(docvalues_cols=...)`), and measures the filter legs against
their unfiltered baseline.  The design claim under test: a dv filter costs
ONE predicate-pushed, column-pruned doc_stats scan plus a semi-join keyed on
doc_id — posting traffic is IDENTICAL to the unfiltered query — so the wall
delta should be roughly constant across predicate selectivities (2.5% 'es'
vs 95% 'en'), not proportional to the match count.

    python scripts/dv_scale_bench.py --docs 1000000 --cpus 32 \
        --out BENCH/dv_r5_1m.json
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


def timed(fn, reps):
    walls, res = [], None
    for _ in range(reps):
        t0 = time.time()
        res = fn()
        walls.append(round(time.time() - t0, 3))
    return walls, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--reuse-index", action="store_true")
    args = ap.parse_args()

    corpus = f"/tmp/webtext_{args.docs // 1000}k"
    if not os.path.exists(os.path.join(corpus, "part-00000.parquet")):
        from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

        write_webtext_parquet_parallel(corpus, args.docs, procs=16)

    from pyspark.sql import functions as F

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("dv_scale", cpus=args.cpus)
    results: dict = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "clock_probe_mips": clock_probe(),
        "queries": {},
    }

    # title/body split identical to multifield_scale_bench.py, plus the two
    # doc-values attribute columns the fixture already carries / derives
    mf_corpus = f"/tmp/webtext_mfdv_{args.docs // 1000}k"
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
                "lang",
                F.length("text").cast("long").alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(mf_corpus)
        )

    index_dir = f"/tmp/mf_scale_idx_dv_{args.docs}"
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
            docvalues_cols=("lang", "n_chars"),
        )
        t0 = time.time()
        build_index(spark, mf_corpus, index_dir, cfg=cfg)
        results["index_build_s"] = round(time.time() - t0, 2)
        results["index_docs_per_sec"] = round(args.docs / results["index_build_s"], 1)

    eng = SearchEngine(spark, index_dir)
    assert eng.docvalues_cols == ("lang", "n_chars"), eng.docvalues_cols

    suite = {
        # the unfiltered baseline every dv leg rides on
        "mf_must_should": lambda: eng.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10
        ),
        # 2.5%-selective equals: the eligible side is small -> broadcast-able
        "dv_equals_rare": lambda: eng.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            filter=[{"equals": {"path": "lang", "value": "es"}}],
        ),
        # 95%-selective equals: the eligible side is nearly the corpus — the
        # claim is the wall STILL only grows by the scan+join constant
        "dv_equals_head": lambda: eng.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            filter=[{"equals": {"path": "lang", "value": "en"}}],
        ),
        # numeric band + equals combined (two clauses, one predicate)
        "dv_range_band": lambda: eng.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            filter=[
                {"range": {"path": "n_chars", "gte": 300, "lt": 500}},
                {"equals": {"path": "lang", "value": "es"}},
            ],
        ),
        # field sort over the full match set: attr join + distributed top-k
        # by (n_chars desc, doc_id) in place of the score rank
        "dv_sort_desc": lambda: eng.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            sort={"path": "n_chars", "order": "desc"},
        ),
        # freshest-first with a selective filter: the Atlas crawl query
        "dv_filter_plus_sort": lambda: eng.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            filter=[{"equals": {"path": "lang", "value": "es"}}],
            sort={"path": "n_chars", "order": "desc"},
        ),
        # $searchMeta facets: two bucket aggregations over the matched set,
        # scoring skipped (membership decode only)
        "dv_facets": lambda: eng.facet_fields(
            must=[("title", "the")], should=[("body", "oil")],
            facets={
                "langs": {"type": "string", "path": "lang"},
                "sizes": {"type": "number", "path": "n_chars",
                          "boundaries": [0, 400, 800, 1600]},
            },
        ),
    }
    for name, fn in suite.items():
        walls, res = timed(fn, args.reps)
        if isinstance(res, dict):  # facet_fields: {"count", "facet"}
            results["queries"][name] = {
                "walls_s": walls,
                "total": int(res["count"]),
                "buckets": {
                    fname: {str(b): int(c)
                            for b, c in zip(pdf["bucket"], pdf["count"])}
                    for fname, pdf in res["facet"].items()
                },
            }
            print(f"{name}: walls={walls} total={res['count']}", flush=True)
            continue
        results["queries"][name] = {
            "walls_s": walls,
            "total": int(res.total),
            "page_rows": len(res.page),
        }
        print(f"{name}: walls={walls} total={res.total}", flush=True)

    # cross-query exactness: the three lang partitions of the baseline
    totals = {n: results["queries"][n]["total"] for n in results["queries"]}
    results["partition_check"] = {
        "baseline": totals["mf_must_should"],
        "es_plus_en": totals["dv_equals_rare"] + totals["dv_equals_head"],
    }

    results["clock_probe_mips_end"] = clock_probe()
    out = args.out or f"BENCH/dv_r5_{args.docs}_{args.cpus}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
