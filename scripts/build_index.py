"""spark-submit entrypoint for the distributed index build.

Cluster usage (the north-rule invocation):

    cd /root/repo && zip -r /tmp/ses.zip search_engine_spark
    spark-submit --py-files /tmp/ses.zip scripts/build_index.py \
        --corpus /data/webtext --index-dir /data/index \
        --partitions 512 --waves 8

Local scaling evidence (N vs 4N cores on the same input):

    SPARK_GRAFT_CPUS=8  python scripts/build_index.py --corpus ... --index-dir /tmp/i8
    SPARK_GRAFT_CPUS=32 python scripts/build_index.py --corpus ... --index-dir /tmp/i32

Prints one JSON line with docs/sec and the manifest summary.  Re-running with
the same --index-dir resumes from completed segments (lineage in the manifest
table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet path of the webtext corpus")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--block-docs", type=int, default=1024)
    ap.add_argument("--id-col", default=None, help="pre-assigned unique long id column")
    ap.add_argument("--run-id", default="cli")
    args = ap.parse_args()

    from search_engine_spark.index.builder import BuildConfig, build_index
    from search_engine_spark.session import get_spark

    spark = get_spark("build_index")
    cfg = BuildConfig(
        block_docs=args.block_docs, n_partitions=args.partitions, waves=args.waves
    )
    t0 = time.time()
    metrics = build_index(
        spark, args.corpus, args.index_dir, cfg=cfg, run_id=args.run_id, id_col=args.id_col
    )
    wall = time.time() - t0
    metrics.update(
        {
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(metrics["n_docs"] / wall, 1),
            # the session's real parallelism — honest under spark-submit too,
            # where the master (and thus core count) comes from the launcher,
            # not SPARK_GRAFT_CPUS
            "cores": spark.sparkContext.defaultParallelism,
        }
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
