"""Round-5-late query surfaces at 10^6 documents — scale evidence for
wildcard, MoreLikeThis, and the mustNot/filter/boost compound legs, on the
SAME 1M-doc indexes the earlier ladders built (reused when present):

  /tmp/query_scale_idx_1000000   single-field (query/expansion ladders)
  /tmp/mf_scale_idx_1000000      two-field title/body (multifield ladder)

Each surface's two costs at scale are separated like the expansion ladder:
the COLD dictionary work (wildcard = fixed-prefix range scan + regex over
the ~57k-term cached dictionary; MLT = O(distinct text terms) df lookups +
driver-side top-N selection) and the SERVE of the resulting disjunction
(ordinary posting traffic, heavy only when the expansion lands on a head
term).  The compound legs add no dictionary work at all — mustNot/filter/
boost ride the same decode+fold with an extra JVM array predicate / a
scaled idf — so their numbers should sit on top of the plain must+should
latencies.

    python scripts/r5late_scale_bench.py --docs 1000000 --cpus 32 \
        --reuse-index --out BENCH/r5late_1m.json
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

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("r5late_scale", cpus=args.cpus)
    results: dict = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "clock_probe_mips": clock_probe(),
        "queries": {},
    }

    sf_idx = f"/tmp/query_scale_idx_{args.docs}"
    if not (args.reuse_index and os.path.exists(sf_idx)):
        shutil.rmtree(sf_idx, ignore_errors=True)
        cfg = BuildConfig(
            block_docs=1024, target_ranges=max(64, args.docs // 8192),
            min_range_docs=2048, n_partitions=args.cpus, waves=1,
        )
        t0 = time.time()
        build_index(spark, corpus, sf_idx, cfg=cfg)
        results["sf_index_build_s"] = round(time.time() - t0, 2)
    eng = SearchEngine(spark, sf_idx)
    results["n_dict_terms"] = (
        int(len(eng._terms_arr)) if eng._terms_arr is not None else None
    )

    # ---- wildcard: cold expansion vs serve, tail / head / all-dict ------
    wc_suite = {
        # tail pattern: tiny expansion, tiny serve
        "wildcard_tail": ("zeb*a", {}),
        # head-reaching pattern: 'th*' covers 'the' — the serve is an
        # ordinary head-term disjunction, the interesting part is that the
        # dictionary scan stays ~free next to it
        "wildcard_head": ("th*", {}),
        # no fixed prefix: the regex walks the WHOLE cached dictionary —
        # the worst-case cold cost; capped to keep the serve bounded
        "wildcard_all_capped": ("*a*", {"max_expansions": 50}),
    }
    for name, (pat, kw) in wc_suite.items():
        t0 = time.time()
        n_exp = len(eng.expand_wildcard(pat, kw.get("max_expansions")))
        expand_cold = round(time.time() - t0, 3)
        walls, res = timed(
            lambda: eng.search(pat, k=10, wildcard=True, **kw), args.reps
        )
        results["queries"][name] = {
            "pattern": pat, "expansions": n_exp,
            "expand_s_cold": expand_cold, "walls_s": walls,
            "total": int(res.total),
        }
        print(f"{name}: expand={expand_cold}s n={n_exp} walls={walls} "
              f"total={res.total}", flush=True)

    # ---- MoreLikeThis: selection cost vs serve ---------------------------
    import pyarrow.parquet as pq

    seed = pq.read_table(
        os.path.join(corpus, "part-00000.parquet"), columns=["text"]
    ).column("text")[7].as_py()
    for name, text, mqt in (
        ("mlt_seed_doc", seed, 25),
        ("mlt_short_text", "the oil market rose as supply fell", 10),
    ):
        walls, res = timed(
            lambda: eng.more_like_this(text, k=10, max_query_terms=mqt),
            args.reps,
        )
        results["queries"][name] = {
            "max_query_terms": mqt, "text_tokens": len(text.split()),
            "walls_s": walls, "total": int(res.total),
        }
        print(f"{name}: walls={walls} total={res.total}", flush=True)

    # ---- compound occur types on the 1M multifield index -----------------
    mf_idx = f"/tmp/mf_scale_idx_{args.docs}"
    if os.path.exists(mf_idx):
        mfe = SearchEngine(spark, mf_idx)
        mf_suite = {
            # baseline shape shared with BENCH/multifield_r5_1m.json
            "mf_must_should": lambda: mfe.search_fields(
                must=[("title", "the")], should=[("body", "oil")], k=10),
            "mf_mustnot": lambda: mfe.search_fields(
                must=[("title", "the")], must_not=[("body", "oil")], k=10),
            "mf_filter": lambda: mfe.search_fields(
                filter=[("title", "the")], should=[("body", "oil")],
                minimum_should_match=0, k=10),
            "mf_boost": lambda: mfe.search_fields(
                should=[{"field": "title", "query": "oil", "boost": 3.0},
                        ("body", "oil")], k=10),
            "mf_wildcard_clause": lambda: mfe.search_fields(
                should=[{"field": "body", "query": "zeb*a",
                         "kind": "wildcard"}], k=10),
        }
        for name, fn in mf_suite.items():
            walls, res = timed(fn, args.reps)
            results["queries"][name] = {
                "walls_s": walls, "total": int(res.total),
                "page_rows": len(res.page),
            }
            print(f"{name}: walls={walls} total={res.total}", flush=True)
    else:
        results["mf_index"] = "absent (run multifield_scale_bench.py first)"

    results["clock_probe_mips_end"] = clock_probe()
    out = args.out or f"BENCH/r5late_{args.docs}_{args.cpus}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
