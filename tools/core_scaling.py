"""Per-core-count scaling bench: the same noop-sink min-of-N protocol
as bench.py, run at several core counts over the SAME fixture, one
fresh process per core count (honoring the driver's env contract:
SPARK_GRAFT_CPUS sets local[k], SPARK_GRAFT_SF_DIR the data).

The sf0.1 driver fixtures are single-row-group files, so every scan is
one task and 8v32-core ratios pin to ~1 regardless of plan quality
(r16 verdict finding 1) — this tool exists to measure scale-out where
it CAN show: the multi-row-group .benchdata/sf1 point
(tools/make_bigsf.py). Ratios land in a committed JSON artifact so
"parallelises at scale" is measured, not argued from plans.

Usage:
    python tools/core_scaling.py [sf_dir] [--cpus 8,16,32] [--runs 2]
        [--keys k1,k2,... | --headline-plus] [--json out.json]

--headline-plus (default) = bench.py's 26 headline keys + the r16/r17
reshaped non-headline keys, so the reshapes' scale behavior is on the
record too.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

# Non-headline keys whose plans the r16/r17 optimization rounds
# reshaped — their scale-out behavior is part of the evidence.
RESHAPED_EXTRAS = [
    "money_convert_asof",
    "pipeline_settlement_report",
    "profile_columns",
    "dedup_span_removal",
    "dedup_simhash_crosscheck",
    "agg_approx_distinct_err",
    "graph_pagerank",
    "neardup_cosine_lsh",
    "dedup_semantic_clusters",
    "pipeline_corpus_build",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from hyperswitch_data_backfill_spark.registry import REGISTRY, queries
from hyperswitch_data_backfill_spark.session import get_spark

sf_dir = {sf_dir!r}
keys = {keys!r}
runs = {runs!r}
queries()
spark = get_spark(app_name=f"core-scaling-{{os.environ['SPARK_GRAFT_CPUS']}}")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{{sf_dir}}/orders.parquet").count()
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
warm = pandas_udf(lambda s: s, "long")
spark.range(1000).select(warm(F.col("id"))).write.format("noop").mode("overwrite").save()
out = {{}}
for name in keys:
    fn = REGISTRY[name].fn
    spark.sparkContext.setJobDescription(f"core-scaling: {{name}}")
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    except Exception as e:
        out[name] = -1.0
        print(f"# {{name}}: ERROR {{type(e).__name__}}: {{e}}", file=sys.stderr)
    finally:
        spark.sparkContext.setJobDescription(None)
print(json.dumps(out))
spark.stop()
"""


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    cpus = [8, 16, 32]
    if "--cpus" in argv:
        i = argv.index("--cpus")
        cpus = [int(c) for c in argv[i + 1].split(",")]
        del argv[i : i + 2]
    runs = 2
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    keys = None
    if "--keys" in argv:
        i = argv.index("--keys")
        keys = argv[i + 1].split(",")
        del argv[i : i + 2]
    if "--headline-plus" in argv:
        argv.remove("--headline-plus")
    sf_dir = argv[0] if argv else str(_REPO / ".benchdata" / "sf1")
    if keys is None:
        sys.path.insert(0, str(_REPO))
        import bench

        keys = list(bench.HEADLINE) + RESHAPED_EXTRAS

    results: dict[int, dict[str, float]] = {}
    load: dict[int, list[float]] = {}
    first = True
    for c in sorted(cpus, reverse=True):  # big first: fails fast on memory
        if not first:
            # let the previous leg's JVM fully drain so its tail does
            # not contend with the next leg's measurements (1-min
            # loadavg stays a LAGGING average of the prior leg either
            # way — the settle keeps actual concurrent load at zero)
            time.sleep(45)
        first = False
        load[c] = [round(x, 2) for x in os.getloadavg()]
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(c))
        child = _CHILD.format(repo=str(_REPO), sf_dir=sf_dir, keys=keys, runs=runs)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True,
            env=env, cwd=str(_REPO),
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
        results[c] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"# cpus={c}: total "
              f"{sum(v for v in results[c].values() if v > 0):.1f}s "
              f"({time.time()-t0:.0f}s wall)", file=sys.stderr)

    base = max(cpus)
    table = {}
    for k in keys:
        row = {f"c{c}": results[c].get(k) for c in cpus}
        for c in cpus:
            if c != base and results[c].get(k, -1) > 0 and results[base].get(k, -1) > 0:
                row[f"x{base}v{c}"] = round(results[c][k] / results[base][k], 2)
        table[k] = row
    totals = {f"c{c}": round(sum(v for v in results[c].values() if v > 0), 3)
              for c in cpus}
    rec = {
        "sf_dir": sf_dir,
        "runs": runs,
        "cpus": cpus,
        "loadavg_at_start": load,
        "totals": totals,
        "queries": table,
    }
    print(json.dumps(rec))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"# wrote {json_out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
