"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` on DuckDB over the same parquet, comparing row count,
column names, and (order-insensitively) values.  Exit code 1 on any
mismatch.  Usage: python tools/check_correctness.py [sf_dir] [name...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if not math.isclose(fx, fy, rel_tol=1e-9, abs_tol=1e-12):
                    return False, f"col {c} row {i}: {x!r} != {y!r}"
            elif x != y:
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, ""


def main() -> int:
    import json
    import os

    import __spark_entry__ as entrymod
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    spark = get_spark(app_name="check-correctness", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:400]}")
            record[name] = {"ok": False, "err": f"spark: {str(e)[:300]}"}
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            record[name] = {"ok": True, "rows": len(got), "oracle": False}
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:400]}")
            record[name] = {"ok": False, "err": f"duckdb: {str(e)[:300]}"}
            continue
        ok, why = values_match(normalize(got), normalize(exp))
        status = "OK  " if ok else "FAIL"
        print(f"{status}  {name}: spark={len(got)} duckdb={len(exp)} [{time.time()-t0:.1f}s]"
              + ("" if ok else f"  -> {why}"))
        record[name] = {
            "ok": ok, "spark_rows": int(len(got)),
            "oracle_rows": int(len(exp)), "sec": round(time.time() - t0, 1),
            **({} if ok else {"err": why[:300]}),
        }
        if not ok:
            failures.append((name, why))
    # machine-readable sibling of the driver artifact covering EVERY
    # registered gate (the driver's own record caps at 50 rows):
    # set CHECK_JSON_OUT=path to write {name: {ok, rows, ...}}
    out_path = os.environ.get("CHECK_JSON_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
