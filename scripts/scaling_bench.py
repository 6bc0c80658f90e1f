"""Scaling-efficiency evidence for the north rule (N vs 4N cores).

A real multi-executor cluster is not available in this sandbox, so the same
job runs at two pinned parallelism levels on the same input: ``taskset`` pins
the process to N (resp. 4N) physical CPUs and ``local[N]`` matches the task
slots, so GC/shuffle/IO threads are bounded by the same budget an N-core
executor would have.

Usage:
    python scripts/scaling_bench.py [--docs 4000000] [--n 4] [--runs 1]

Generates the deterministic webtext corpus (parallel, counter-based — see
fixtures/webtext.py), runs the full index build at N and 4N cores, and prints
a JSON summary with docs/sec at both levels and efficiency = (T_N / T_4N) / 4.
Report the best of ``--runs`` runs per level (the host shows steal time and
run-to-run variance; min wall is the standard noise-robust statistic).

Also prints a frequency-throttle calibration: per-core throughput of a fixed
python workload at 1/N/4N busy cores.  On this host, 32 busy cores clock
~33% lower than 8 — an upper bound on any measured multi-core efficiency
that has nothing to do with the job's structure.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(n):
    x = 1
    for _ in range(n):
        x = (x * 1103515245 + 12345) % 2147483647
    return x


def calibrate(levels):
    out = {}
    for n in levels:
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(_burn, [20_000_000] * n)
        out[n] = round(20_000_000 / (time.time() - t0) / 1e6, 2)  # M iter/s/core
    return out


def gen_corpus(path: str, n_rows: int, procs: int = 16):
    if os.path.exists(os.path.join(path, "part-00000.parquet")):
        return
    sys.path.insert(0, REPO)
    from search_engine_spark.fixtures.webtext import write_webtext_parquet_parallel

    write_webtext_parquet_parallel(path, n_rows, procs=procs)


def run_leg(corpus: str, cores: int, partitions: int, tag: str) -> dict:
    index_dir = f"/tmp/scaling_idx_{tag}_{cores}"
    shutil.rmtree(index_dir, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    cpu_list = f"0-{cores - 1}"
    cmd = [
        "taskset", "-c", cpu_list, sys.executable,
        os.path.join(REPO, "scripts", "build_index.py"),
        "--corpus", corpus, "--index-dir", index_dir,
        "--partitions", str(partitions), "--waves", "1",
    ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--n", type=int, default=4, help="small-leg cores (big leg = 4n)")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    corpus = f"/tmp/webtext_{args.docs // 1000}k"
    gen_corpus(corpus, args.docs)

    legs: dict[int, list[dict]] = {args.n: [], 4 * args.n: []}
    for r in range(args.runs):
        for cores in (4 * args.n, args.n):
            m = run_leg(corpus, cores, args.partitions, tag=f"{args.docs}")
            legs[cores].append(m)
            print(json.dumps(m), file=sys.stderr)

    best = {c: min(ms, key=lambda m: m["wall_sec"]) for c, ms in legs.items()}
    mean = {c: sum(m["wall_sec"] for m in ms) / len(ms) for c, ms in legs.items()}
    t_small, t_big = best[args.n]["wall_sec"], best[4 * args.n]["wall_sec"]
    print(json.dumps({
        "docs": args.docs,
        "n_cores": args.n,
        "4n_cores": 4 * args.n,
        "runs_per_leg": args.runs,
        "wall_sec": {str(c): [m["wall_sec"] for m in ms] for c, ms in legs.items()},
        "docs_per_sec": {
            str(args.n): best[args.n]["docs_per_sec"],
            str(4 * args.n): best[4 * args.n]["docs_per_sec"],
        },
        "speedup_best": round(t_small / t_big, 3),
        "efficiency_best": round(t_small / t_big / 4, 3),
        "speedup_mean": round(mean[args.n] / mean[4 * args.n], 3),
        "efficiency_mean": round(mean[args.n] / mean[4 * args.n] / 4, 3),
        "freq_throttle_calibration_Mips_per_core": calibrate([1, args.n, 4 * args.n]),
    }))


if __name__ == "__main__":
    main()
