"""Driver-style contract check: run each __spark_entry__.queries() entry
and its oracle_sql() twin side by side at a given sf_dir, compare row
count, schema (sorted column names), and exact sorted-row values —
locally, before the driver does it for real.

Usage:
    python scripts/check_contract.py [sf_dir] [entry ...]

Defaults: sf_dir=/root/testdata/sf0.01, all entries (or the names given).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    # stringify everything so rows with NULLs (e.g. ROLLUP subtotal
    # keys) stay sortable across mixed types; floats are rounded to the
    # contract's 4 decimals first so equal values stringify equally
    if isinstance(v, float):
        return str(round(v, 4))
    return str(v)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("contract-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args or sorted(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(_norm(r[c]) for c in scols) for r in sdf.collect()
            )
            if name not in oracles:
                print(f"{name}: rows={len(srows)} (rows-only, no oracle) "
                      f"[{time.time()-t0:.1f}s]")
                continue
            cur = con.execute(oracles[name])
            ocols_raw = [d[0] for d in cur.description]
            ocols = sorted(ocols_raw)
            idx = [ocols_raw.index(c) for c in ocols]
            orows = sorted(
                tuple(_norm(row[i]) for i in idx) for row in cur.fetchall()
            )
            ok_rows = len(srows) == len(orows)
            ok_schema = scols == ocols
            ok_vals = srows == orows
            status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(f"{name}: {status} rows {len(srows)}/{len(orows)} "
                  f"schema {scols == ocols} values {ok_vals} [{time.time()-t0:.1f}s]")
            if not ok_schema:
                print(f"  spark cols {scols}\n  oracle cols {ocols}")
            if ok_schema and not ok_vals:
                diff = [(a, b) for a, b in zip(srows, orows) if a != b][:5]
                oset, sset = set(orows), set(srows)
                only_s = [r for r in srows if r not in oset][:3]
                only_o = [r for r in orows if r not in sset][:3]
                print(f"  first diffs {diff}\n  only-spark {only_s}\n  only-oracle {only_o}")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc} [{time.time()-t0:.1f}s]")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
