"""Concurrent serving of the doc-values surfaces at 10^6 documents.

BENCH §3b established coordinator scale-out on the plain query mix; this
bench answers the narrower question the round-5-late surfaces raise: do
dv filters / field sorts / facets — each adding a doc_stats join to the
plan — multiplex safely and at comparable throughput on one SparkSession?

Mixed deterministic workload over the 1M two-field dv index
(/tmp/mf_scale_idx_dv_1000000, built by dv_scale_bench.py): plain compound
baseline, equals/range filters, field sort, filter+sort, and a facet every
12th query.  A sequential replay of a sample asserts the concurrent results
are identical.

    python scripts/dv_serving_bench.py --docs 1000000 --cpus 32 \
        --out BENCH/dv_serving_1m_c32.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from search_engine_spark.benchutil import clock_probe  # noqa: E402


def make_query(i: int):
    r = (i * 2654435761) % 100
    flt_es = [{"equals": {"path": "lang", "value": "es"}}]
    flt_band = [{"range": {"path": "n_chars", "gte": 300, "lt": 700}}]
    if r < 30:  # plain compound baseline
        return ("baseline", lambda e: e.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10))
    if r < 50:  # selective equals filter
        return ("dv_equals", lambda e: e.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            filter=flt_es))
    if r < 65:  # numeric band
        return ("dv_range", lambda e: e.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            filter=flt_band))
    if r < 80:  # field sort
        return ("dv_sort", lambda e: e.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            sort={"path": "n_chars", "order": "desc"}))
    if r < 92:  # filter + sort in one probe
        return ("dv_filter_sort", lambda e: e.search_fields(
            must=[("title", "the")], should=[("body", "oil")], k=10,
            filter=flt_es, sort={"path": "n_chars", "order": "desc"}))
    # facets (the analytic shape)
    return ("facet", lambda e: e.facet_fields(
        must=[("title", "the")], should=[("body", "oil")],
        facets={"langs": {"type": "string", "path": "lang"}}))


def res_key(out):
    if isinstance(out, dict):  # facet result
        return (out["count"], tuple(
            (n, tuple(map(tuple, pdf.itertuples(index=False, name=None))))
            for n, pdf in sorted(out["facet"].items())
        ))
    return (out.total, [(int(d), round(float(s), 6)) for d, s in
                        zip(out.page["doc_id"], out.page["score"])])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--n-queries", type=int, default=240)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from search_engine_spark.query.engine import SearchEngine
    from search_engine_spark.session import get_spark

    index = f"/tmp/mf_scale_idx_dv_{args.docs}"
    if not os.path.exists(os.path.join(index, "corpus_stats.json")):
        raise SystemExit(f"{index} missing — run dv_scale_bench.py first")
    spark = get_spark(
        "dv_serving", cpus=args.cpus,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    eng = SearchEngine(spark, index)
    workload = [make_query(i) for i in range(args.n_queries)]
    kinds = sorted({k for k, _ in workload})
    for k in kinds:  # one warmup per kind, outside the timed window
        next(fn for kk, fn in workload if kk == k)(eng)

    def run_one(w):
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", threading.current_thread().name
        )
        return res_key(w[1](eng))

    probe0 = clock_probe()
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.threads) as ex:
        concurrent = list(ex.map(run_one, workload))
    wall = time.time() - t0

    # correctness: a deterministic sample replayed sequentially must match
    sample = list(range(0, args.n_queries, 11))
    mismatches = sum(
        1 for i in sample if res_key(workload[i][1](eng)) != concurrent[i]
    )

    out = {
        "n_docs": args.docs,
        "cpus": args.cpus,
        "threads": args.threads,
        "n_queries": args.n_queries,
        "mix": {k: sum(1 for kk, _ in workload if kk == k) for k in kinds},
        "wall_s": round(wall, 2),
        "queries_per_sec": round(args.n_queries / wall, 2),
        "sequential_sample_mismatches": mismatches,
        "clock_probe_mips": probe0,
        "clock_probe_mips_end": clock_probe(),
    }
    path = args.out or f"BENCH/dv_serving_{args.docs}_c{args.cpus}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
