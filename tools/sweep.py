"""Local mirror of the external correctness driver.

Runs every `queries()` entry on a VANILLA SparkSession (no engine confs
— runtime confs must self-apply via catalog.load_table) against its
DuckDB oracle at the given sf dir, and prints one status line per query
plus a summary. Usage:

    python tools/sweep.py [sf_dir] [query ...]

With query names given, sweeps only those.
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hyperswitch_data_backfill_spark.catalog import TABLES  # noqa: E402  (single source of truth)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if "--window" in only:
        # sweep exactly the 50 keys the external driver will check
        from hyperswitch_data_backfill_spark import registry

        registry._load_all_operator_modules()
        only = {n for n in registry._DRIVER_WINDOW if n in registry.REGISTRY}

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    spark = (
        SparkSession.builder.appName("sweep")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_rows_only = n_fail = 0
    t_total = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                n_rows_only += 1
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                continue
            spark_cols = sorted(df.columns)
            srows = [tuple(_norm(r[c]) for c in spark_cols) for r in df.collect()]
            res = con.sql(oracles[name])
            dmap = {c: i for i, c in enumerate(res.columns)}
            duck_cols = sorted(res.columns)
            drows_raw = res.fetchall()
            if spark_cols != duck_cols:
                n_fail += 1
                print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
                continue
            drows = [tuple(_norm(row[dmap[c]]) for c in duck_cols) for row in drows_raw]
            if len(srows) != len(drows):
                n_fail += 1
                print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
                continue
            ss, dd = sorted(srows, key=repr), sorted(drows, key=repr)
            if ss != dd:
                n_fail += 1
                diff = next(
                    (i for i, (a, b) in enumerate(zip(ss, dd)) if a != b), None
                )
                print(
                    f"FAIL {name}: value mismatch at sorted idx {diff}: "
                    f"spark={ss[diff] if diff is not None else '?'} "
                    f"duck={dd[diff] if diff is not None else '?'}"
                )
                continue
            n_pass += 1
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    print(
        f"SUMMARY pass={n_pass} rows_only={n_rows_only} fail={n_fail} "
        f"total={len(qs)} wall={time.time()-t_total:.0f}s"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
