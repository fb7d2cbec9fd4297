"""Production-ingest bench: partitioned vs single-stream JDBC read
(r6 verdict item 7).

The engine's replacement for the reference's LIMIT/OFFSET paging
(sources/jdbc.py, SURVEY §2.5 trap) is Derby-tested for correctness but
was never timed. This tool loads an embedded-Derby table at scale
(default 1M rows — in-JVM, so measured time is pure JDBC-path cost with
no network noise) and times:

  single   — read_jdbc_range(..., num_partitions=1): one result stream,
             the closest analogue of the reference's sequential pager.
  parallel — read_jdbc_range(..., num_partitions=8): eight concurrent
             range readers, Spark's keyset replacement.
  pushdown — parallel + a selective filter, asserting the predicate
             reaches the Derby scan (PushedFilters in the plan) and
             timing the reduced transfer.

Embedded Derby serializes page access through its in-JVM lock manager,
so the parallel speedup measured here is a FLOOR for a real networked
Postgres (where per-connection server processes actually run
concurrently); the tool reports the ratio either way.

Usage: python tools/jdbc_bench.py [--rows 1000000] [--partitions 8] [--n 3]
Prints one JSON line per mode and a markdown summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hyperswitch_data_backfill_spark.sources.jdbc import (  # noqa: E402
    JdbcSourceConfig,
    read_jdbc_range,
)

DERBY_URL = "jdbc:derby:memory:jdbcbench"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def load_fixture(spark: SparkSession, rows: int) -> None:
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL + ";create=true")
    st = conn.createStatement()
    st.execute(
        'CREATE TABLE payment_intent ("payment_id" INT PRIMARY KEY, '
        '"merchant_id" VARCHAR(32), "amount" BIGINT, "status" VARCHAR(8))'
    )
    conn.setAutoCommit(False)
    ps = conn.prepareStatement("INSERT INTO payment_intent VALUES (?, ?, ?, ?)")
    t0 = time.perf_counter()
    for i in range(rows):
        ps.setInt(1, i)
        ps.setString(2, f"m{i % 50}")
        ps.setLong(3, (i * 7919) % 1_000_000)
        ps.setString(4, "OK" if i % 97 else "FAIL")
        ps.addBatch()
        if (i + 1) % 20_000 == 0:
            ps.executeBatch()
            conn.commit()
    ps.executeBatch()
    conn.commit()
    ps.close()
    st.close()
    conn.close()
    print(f"# loaded {rows} rows in {time.perf_counter() - t0:.1f}s", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("jdbc-bench")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_fixture(spark, args.rows)
    cfg = JdbcSourceConfig(
        url=DERBY_URL, table="payment_intent", options={"driver": DERBY_DRIVER}
    )

    def read(num_partitions: int):
        return read_jdbc_range(
            spark, cfg, partition_column='"payment_id"',
            lower_bound=0, upper_bound=args.rows - 1,
            num_partitions=num_partitions,
        )

    def timed(build, label: str) -> dict:
        build().count()  # warm-up (connection pool, codegen)
        walls = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        rec = {"mode": label, "min_wall_s": min(walls), "walls": walls,
               "rows": build().count()}
        print(json.dumps(rec))
        return rec

    single = timed(lambda: read(1), "single")
    par = timed(lambda: read(args.partitions), f"parallel_{args.partitions}")

    filtered = read(args.partitions).filter(F.col("status") == "FAIL")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    pushed = "PushedFilters" in plan and "status" in plan
    fil = timed(
        lambda: read(args.partitions).filter(F.col("status") == "FAIL"),
        "parallel_pushdown",
    )
    fil["filter_pushed_to_source"] = pushed

    ratio = single["min_wall_s"] / par["min_wall_s"]
    print(f"\n| mode | rows | min wall (s) | note |")
    print("|---|---|---|---|")
    print(f"| single-stream | {single['rows']} | {single['min_wall_s']} "
          f"| the reference's sequential-pager analogue |")
    print(f"| parallel x{args.partitions} | {par['rows']} | {par['min_wall_s']} "
          f"| {ratio:.2f}x vs single |")
    print(f"| parallel + pushed filter | {fil['rows']} | {fil['min_wall_s']} "
          f"| PushedFilters reaches Derby: {pushed} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
