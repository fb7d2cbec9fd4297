"""Local mirror of the external correctness driver.

Runs every `queries()` entry on a VANILLA SparkSession (no engine confs
— runtime confs must self-apply via catalog.load_table) against its
DuckDB oracle at the given sf dir, and prints one status line per query
plus a summary. Usage:

    python tools/sweep.py [sf_dir] [query ...] [--json out.json]

With query names given, sweeps only those. `--json` writes a compact
machine-readable record (per-key status/rows/wall + summary) so scale
sweeps leave a committable evidence artifact, not just a scrollback.
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
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
    records: dict[str, dict] = {}
    t_total = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                n_rows_only += 1
                records[name] = {"status": "rows_only", "rows": n,
                                 "wall_s": round(time.time() - t0, 2)}
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                continue
            # Driver-canon guard (r14 verdict item 2): the external
            # driver sorts the collected pandas frame, and nested cells
            # (ndarray/dict/Row) are unhashable there — this mirror's
            # tuple-normalization would happily digest them, letting a
            # driver-red key pass locally (pgwire_scan_embeddings r14).
            from hyperswitch_data_backfill_spark.registry import (
                driver_canon_unsafe_columns,
            )

            unsafe = driver_canon_unsafe_columns(df.schema)
            if unsafe:
                n_fail += 1
                records[name] = {
                    "status": "fail",
                    "err": f"nested-typed result columns {unsafe} — "
                           "driver canon cannot sort these",
                }
                print(f"FAIL {name}: nested-typed columns {unsafe} "
                      "(driver canon would crash — project to scalars)")
                continue
            spark_cols = sorted(df.columns)
            srows = [tuple(_norm(r[c]) for c in spark_cols) for r in df.collect()]
            res = con.sql(oracles[name])
            dmap = {c: i for i, c in enumerate(res.columns)}
            duck_cols = sorted(res.columns)
            drows_raw = res.fetchall()
            if spark_cols != duck_cols:
                n_fail += 1
                records[name] = {"status": "fail", "err": "column mismatch"}
                print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
                continue
            drows = [tuple(_norm(row[dmap[c]]) for c in duck_cols) for row in drows_raw]
            if len(srows) != len(drows):
                n_fail += 1
                records[name] = {"status": "fail", "err": "rowcount mismatch"}
                print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
                continue
            ss, dd = sorted(srows, key=repr), sorted(drows, key=repr)
            if ss != dd:
                n_fail += 1
                diff = next(
                    (i for i, (a, b) in enumerate(zip(ss, dd)) if a != b), None
                )
                records[name] = {"status": "fail", "err": "value mismatch"}
                print(
                    f"FAIL {name}: value mismatch at sorted idx {diff}: "
                    f"spark={ss[diff] if diff is not None else '?'} "
                    f"duck={dd[diff] if diff is not None else '?'}"
                )
                continue
            n_pass += 1
            records[name] = {"status": "pass", "rows": len(srows),
                             "wall_s": round(time.time() - t0, 2)}
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            records[name] = {"status": "err",
                             "err": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    print(
        f"SUMMARY pass={n_pass} rows_only={n_rows_only} fail={n_fail} "
        f"total={len(qs)} wall={time.time()-t_total:.0f}s"
    )
    if json_out:
        import json
        import os

        payload = {
            "sf_dir": sf_dir,
            "loadavg": round(os.getloadavg()[0], 2),
            "summary": {"pass": n_pass, "rows_only": n_rows_only,
                        "fail": n_fail, "total": len(qs),
                        "wall_s": round(time.time() - t_total, 1)},
            "keys": records,
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
