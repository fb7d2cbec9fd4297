"""Isolated per-query re-run — BENCH_NOTES' outlier protocol.

When a headline query's driver-bench number moves round-over-round, the
full 26-query sweep can't distinguish a plan regression from JVM/GC
roaming stalls or machine contention. This tool times ONE query per
fresh process (own SparkSession, own JIT state): untimed warm-up run,
then N timed runs, report the min — the engine's actual steady-state
cost with nothing else on the heap.

Usage: python tools/isolate_bench.py <query> [query ...] [--n 3] [--sf-dir D]
Prints one JSON line per query: {"query": ..., "min_sec": ..., "runs": [...]}.
Each query runs in a SUBPROCESS so sessions never share a JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from hyperswitch_data_backfill_spark.registry import REGISTRY, queries
from hyperswitch_data_backfill_spark.session import get_spark

name, sf_dir, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name=f"isolate-{{name}}")
queries()
fn = REGISTRY[name].fn

# same warmup as bench.py: parquet reader + python-worker spawn
spark.read.parquet(f"{{sf_dir}}/orders.parquet").count()
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
warm = pandas_udf(lambda s: s, "long")
spark.range(1000).select(warm(F.col("id"))).write.format("noop").mode("overwrite").save()

fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # untimed
runs = []
for _ in range(n):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
print(json.dumps({{"query": name, "min_sec": min(runs), "runs": runs,
                   "loadavg": [round(x, 2) for x in os.getloadavg()]}}))
spark.stop()
"""


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1]); del args[i:i + 2]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]; del args[i:i + 2]
    if not args:
        sys.exit("usage: isolate_bench.py <query> [...] [--n 3] [--sf-dir D]")
    child_src = _CHILD.format(repo=str(_REPO))
    for name in args:
        out = subprocess.run(
            [sys.executable, "-c", child_src, name, sf_dir, str(n)],
            capture_output=True, text=True, cwd=_REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if out.returncode != 0 or not line:
            print(json.dumps({"query": name, "error": out.stderr[-500:]}))
        else:
            print(line[-1])


if __name__ == "__main__":
    main()
