"""Self-check harness replicating the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted by
their full stringified tuple).

Usage: python tools/check_gate.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        col = pdf[c]
        if col.dtype == object:
            pdf[c] = col.astype(str)
        elif str(col.dtype).startswith("datetime"):
            pdf[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype.kind == "f":
            pdf[c] = col.round(9).map(lambda v: f"{v:.9f}")
        else:
            pdf[c] = col.astype(str)
    rows = sorted(map(tuple, pdf.itertuples(index=False, name=None)))
    import hashlib

    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(rows), cols, h


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict = {}

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    from search_engine_spark.session import get_spark

    spark = get_spark("check_gate", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    fails, passes, weak = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            fails.append((name, f"SPARK ERROR: {e}"))
            records[name] = {"err": f"spark: {e}"}
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            weak.append(name)
            records[name] = {"spark_rows": len(sdf), "rows_only": True, "err": None}
            print(f"[rows-only] {name}: {len(sdf)} rows  ({t_spark:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            fails.append((name, f"DUCKDB ERROR: {e}"))
            records[name] = {"err": f"duckdb: {e}"}
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        ns, cs, hs = canon(sdf)
        no, co, ho = canon(odf)
        records[name] = {
            "rows_match": ns == no,
            "schema_match": cs == co,
            "hash_match": hs == ho,
            "spark_rows": ns,
            "oracle_rows": no,
            "spark_s": round(t_spark, 1),
            "err": None,
        }
        if ns != no:
            fails.append((name, f"rowcount {ns} != {no}"))
            print(f"[FAIL] {name}: rowcount spark={ns} duck={no}")
        elif cs != co:
            fails.append((name, f"cols {cs} != {co}"))
            print(f"[FAIL] {name}: cols spark={cs} duck={co}")
        elif hs != ho:
            fails.append((name, "value hash mismatch"))
            # show a diff sample
            merged = sdf.sort_values(sorted(sdf.columns)).head(3)
            print(f"[FAIL] {name}: value hash mismatch; spark sample:\n{merged}")
            print(odf.sort_values(sorted(odf.columns)).head(3))
        else:
            passes.append(name)
            print(f"[ok] {name}: {ns} rows  ({t_spark:.1f}s)")

    print(f"\n{len(passes)} ok, {len(weak)} rows-only, {len(fails)} FAILED")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_ok": len(passes),
                    "n_rows_only": len(weak),
                    "n_failed": len(fails),
                    "gates": records,
                },
                f,
                indent=2,
            )
        print(f"wrote {json_out}")
    for n, r in fails:
        print(f"  FAIL {n}: {r[:200]}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
