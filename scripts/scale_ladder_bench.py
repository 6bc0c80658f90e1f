"""Scale-evidence run for the dedup/similarity ladder at 10^6 rows.

The sf0.01 correctness gates prove the ladder's *algorithms* at 500-8,000
rows; this harness proves the *scale claims* — bucket-bounded candidate
enumeration, plane-count scaling, candidate-semi-joined verification,
budgeted component tiering, √N-cell IVF with matmul training — by running
the full ladder on generated 1M-doc / 1M-vector corpora at local[N] and
recording wall time, shuffle bytes (Spark REST API), candidate-pair counts,
dropped-bucket observability, and which component tier engaged.

Usage:
    python scripts/scale_ladder_bench.py [--docs 1000000] [--vecs 1000000]
        [--cpus 32] [--out BENCH/scale_r4_1m.json] [--keep]

Corpus shapes (deterministic, md5/splitmix64-derived — no RNG state):
- documents: 60 eight-letter words per doc; every 20th doc clones the
  previous with 2 words replaced (token jaccard ≈0.905) — 5% planted
  near-dup pairs over an otherwise-distinct corpus, the separable regime
  MinHash-LSH serves (see test_minhash_ladder_recall_floor).
- embeddings: 64-dim unit vectors; every 20th vector is a near-dup of the
  previous (cosine ≈0.995), rest quasi-orthogonal.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

UI_PORT = 4047


# ---------------------------------------------------------------- corpora

def gen_documents(spark, path: str, n_docs: int):
    """Distributed deterministic corpus: words = md5(key) hex mapped onto
    a-p letters (the tokenizer splits on [^a-z]+, so digits must not appear);
    doc 20k+19 clones doc 20k+18 with word positions 3 and 7 re-salted."""
    is_clone = (F.col("id") % 20) == 19
    base = F.when(is_clone, F.col("id") - 1).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.translate(
            F.substring(
                F.md5(
                    F.when(
                        is_clone & i.isin(3, 7),
                        F.concat_ws("-", F.lit("salt"), F.col("id"), i),
                    ).otherwise(F.concat_ws("-", base, i))
                ),
                1,
                8,
            ),
            "0123456789",
            "ghijklmnop",
        ),
    )
    (
        spark.range(n_docs, numPartitions=64)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
        .write.mode("overwrite")
        .parquet(path)
    )


def gen_embeddings(spark, path: str, n_vecs: int, dim: int = 64):
    """Distributed deterministic vectors via vectorized splitmix64: unit
    vectors, quasi-orthogonal except planted near-dup pairs (2k+18, 2k+19)
    at cosine ≈0.995."""

    def gen(it):
        mask = np.uint64(0xFFFFFFFFFFFFFFFF)

        def mix(z):
            z = (z + np.uint64(0x9E3779B97F4A7C15)) & mask
            z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
            z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
            return z ^ (z >> np.uint64(31))

        def base_mat(ids, salt):
            keys = (
                ids.astype(np.uint64)[:, None] * np.uint64(dim)
                + np.arange(dim, dtype=np.uint64)[None, :]
                + np.uint64(salt)
            )
            return mix(mix(keys)).astype(np.float64) / 2**63 - 1.0

        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            is_clone = (ids % 20) == 19
            src = np.where(is_clone, ids - 1, ids)
            X = base_mat(src, 0)
            noise = base_mat(ids, 10**12)
            X = X + np.where(is_clone, 0.1, 0.0)[:, None] * noise
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [row.astype(np.float32) for row in X],
                    "label": (ids % 20).astype(np.int32),
                }
            )

    (
        spark.range(n_vecs, numPartitions=64)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>, label int")
        .write.mode("overwrite")
        .parquet(path)
    )


# ------------------------------------------------------------- measurement

def shuffle_totals():
    """Sum shuffle read/write bytes over all completed stages (REST API)."""
    try:
        apps = json.load(
            urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/applications", timeout=10)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=30,
            )
        )
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception as e:  # UI races are not worth failing the bench over
        print(f"  [shuffle metrics unavailable: {e}]", file=sys.stderr)
        return (0, 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vecs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="BENCH/scale_r4_1m.json")
    ap.add_argument("--keep", action="store_true", help="keep the generated corpora")
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        metavar="STAGE",
        choices=["minhash", "emb", "ivf", "brute"],
        help="run only the named stage groups, each in THIS fresh process — "
        "back-to-back stages in one JVM pollute each other's walls (GC "
        "pressure from the previous stage's shuffle state); per-stage "
        "scaling legs must come from fresh-process runs",
    )
    ap.add_argument(
        "--force-distributed-components",
        action="store_true",
        help="set the driver union-find edge budget to 0 so dedup_decisions "
        "exercises the distributed min-label fixpoint tier (the >5M-edge "
        "path) on this corpus; runs ONLY the decisions stage",
    )
    args = ap.parse_args()

    from search_engine_spark.session import get_spark

    spark = get_spark(
        "scale_ladder",
        cpus=args.cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )

    sf_dir = f"/tmp/scale_ladder_{args.docs}_{args.vecs}"
    os.makedirs(sf_dir, exist_ok=True)
    results: dict = {
        "n_docs": args.docs,
        "n_vecs": args.vecs,
        "cpus": args.cpus,
        "stages": {},
    }

    def timed(name, fn, **extra):
        r0, w0 = shuffle_totals()
        t0 = time.time()
        out = fn()
        wall = round(time.time() - t0, 2)
        r1, w1 = shuffle_totals()
        rec = {
            "wall_s": wall,
            "shuffle_read_mb": round((r1 - r0) / 2**20, 1),
            "shuffle_write_mb": round((w1 - w0) / 2**20, 1),
            **extra,
        }
        if isinstance(out, int):
            rec["rows"] = out
        results["stages"][name] = rec
        print(f"{name}: {wall}s  rows={rec.get('rows')}  "
              f"shW={rec['shuffle_write_mb']}MB", flush=True)
        return out

    # throttle probe: the one shared calibration (benchutil.clock_probe)
    from search_engine_spark.benchutil import clock_probe

    results["clock_probe_mips"] = clock_probe()

    if not os.path.exists(os.path.join(sf_dir, "documents.parquet", "_SUCCESS")):
        timed("gen_documents", lambda: gen_documents(
            spark, os.path.join(sf_dir, "documents.parquet"), args.docs))
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet", "_SUCCESS")):
        timed("gen_embeddings", lambda: gen_embeddings(
            spark, os.path.join(sf_dir, "embeddings.parquet"), args.vecs))

    from search_engine_spark.operators import dedup, similarity

    if args.force_distributed_components:
        dedup._DRIVER_EDGE_BUDGET = 0
        dec = timed(
            "dd_dedup_decisions_distributed",
            lambda: dedup.dedup_decisions(spark, sf_dir).count(),
            component_tier="distributed_fixpoint_forced",
        )
        results["total_wall_s"] = round(
            sum(s["wall_s"] for s in results["stages"].values()), 1
        )
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results, indent=2))
        spark.stop()
        return

    def want(group: str) -> bool:
        return args.only is None or group in args.only

    # --- minhash ladder -----------------------------------------------------
    if want("minhash"):
        timed("dd_minhash_signatures", lambda: dedup.minhash_signatures(spark, sf_dir).count())
        n_cand = timed("dd_lsh_candidate_pairs",
                       lambda: dedup.lsh_candidate_pairs(spark, sf_dir).count())
        cand_bound = args.docs * dedup._BANDS * dedup._BUCKET_CAP
        results["stages"]["dd_lsh_candidate_pairs"]["bound_n_bands_cap"] = cand_bound
        results["stages"]["dd_lsh_candidate_pairs"]["bound_ratio"] = round(n_cand / cand_bound, 4)

        edges = timed("dd_verified_pairs", lambda: dedup._verified_pairs(spark, sf_dir).count())
        results["stages"]["dd_verified_pairs"]["component_tier"] = (
            "driver_union_find" if edges <= dedup._DRIVER_EDGE_BUDGET else "distributed_fixpoint"
        )
        dec = timed("dd_dedup_decisions", lambda: dedup.dedup_decisions(spark, sf_dir).count())
        results["stages"]["dd_dedup_decisions"]["planted_clone_docs"] = args.docs // 20

    # --- embedding LSH ladder ----------------------------------------------
    if want("emb"):
        nplanes = dedup._emb_nplanes(args.vecs)
        dropped = dedup.embedding_lsh_dropped_buckets(
            spark, sf_dir, buckets_fn=dedup._emb_band_buckets_arrow
        ).toPandas()
        timed(
            "dd_embedding_neardup_lsh_kernel",
            lambda: dedup.embedding_neardup_lsh_kernel(spark, sf_dir).count(),
            nplanes_per_band=nplanes,
            bands=dedup._EMB_BANDS,
            dropped_buckets=int(len(dropped)),
            dropped_bucket_max=int(dropped["n_vec"].max()) if len(dropped) else 0,
        )

    # --- IVF ----------------------------------------------------------------
    if want("ivf"):
        ncells = similarity.ivf_ncells(args.vecs)
        nprobe = similarity.ivf_default_nprobe(ncells)
        timed(
            "sim_ann_ivf_kernel_arrow_train",
            lambda: similarity.ivf_topk_arrow(spark, sf_dir, k=10).count(),
            ncells=ncells, nprobe=nprobe, train="arrow",
        )
    if want("brute"):
        timed(
            "sim_knn_brute_kernel",
            lambda: similarity.brute_topk_arrow(spark, sf_dir, k=10).count(),
        )

    results["total_wall_s"] = round(
        sum(s["wall_s"] for s in results["stages"].values()), 1
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    if not args.keep:
        shutil.rmtree(sf_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
