"""Adversarial-skew face-off (r6 verdict item 6 + stretch item 8).

Runs each contender in its OWN subprocess (fresh JVM) against the
planted-whale fixture from tools/make_skewfix.py, with Spark event
logging on, and reports wall seconds plus the max single-task run time
parsed from the event log — the number that exposes a serialized
reducer even when 31 idle cores hide it from wall-clock.

Join contenders (one orderkey = 50% of the fact table; broadcast
disabled to model the 100 TB dim):
  plain      — shuffle hash join, AQE off: the whale key lands on ONE
               reducer.
  salted     — join_skew_salted's rewrite (fact salt + dim explode),
               AQE off: whale spreads over N_JOIN_SALT reducers, at the
               price of an N_JOIN_SALT-times-replicated dim.
  split      — join_skew_split's hot/cold split-union: whale fact rows
               map-side join a broadcast of their few dim rows; cold
               rows take the ordinary shuffle join.
  plain_aqe  — plain join, AQE + skewJoin on: what the optimizer does
               on its own; the report records whether the plan shows
               the skew=true marker.

Pair-stage contenders (one shingle in 80% of documents):
  jaccard_uncapped — full-space pairing: the whale bucket alone emits
               O((0.8N)^2) pairs.
  jaccard_capped   — max_bucket_members=1000 max-df guard drops the
               whale shingle before pairing.

Usage: python tools/skew_bench.py [--fixture .benchdata/skew] [--n 3]
Prints one JSON line per contender and a markdown summary table.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import glob, json, os, sys, time

sys.path.insert(0, {repo!r})
mode, fixture, n_runs, evdir = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]

from pyspark.sql import SparkSession, functions as F

builder = (
    SparkSession.builder.appName(f"skew-{{mode}}")
    .master(f"local[{{os.environ.get('SPARK_GRAFT_CPUS', '32')}}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", f"file:{{evdir}}")
    .config("spark.eventLog.compress", "false")
    # model the 100 TB dim: no broadcast escape hatch
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
)
if mode == "plain_aqe":
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # sf0.1 partitions are far below the 256 MB default threshold;
        # scale the knobs down so AQE *can* see the skew at bench scale
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    )
else:
    builder = builder.config("spark.sql.adaptive.enabled", "false")
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.operators.dedup import jaccard_pairs
from hyperswitch_data_backfill_spark.operators.joins import join_skew_salted, join_skew_split


def build(mode):
    if mode in ("plain", "plain_aqe"):
        # NO hints: the naive plan a user actually writes (Spark picks
        # sort-merge by default at this size with broadcast disabled)
        li = load_table(spark, fixture, "lineitem")
        orders = load_table(spark, fixture, "orders")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select("l_orderkey", "l_linenumber", "o_orderdate", "l_extendedprice")
        )
    if mode == "salted":
        # the registered operator itself (joins.py), not a re-implementation
        return join_skew_salted(spark, fixture)
    if mode == "split":
        return join_skew_split(spark, fixture)
    if mode == "jaccard_uncapped":
        return jaccard_pairs(load_table(spark, fixture, "documents"))
    if mode == "jaccard_capped":
        return jaccard_pairs(load_table(spark, fixture, "documents"),
                             max_bucket_members=1000)
    raise SystemExit(f"unknown mode {{mode}}")


df = build(mode)
rows = df.count()  # untimed warm-up; also the cardinality record
walls = []
for _ in range(n_runs):
    t0 = time.perf_counter()
    build(mode).write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 3))

plan_str = df._jdf.queryExecution().executedPlan().toString()
# look for the skew=true join marker, ignoring scan Location lines so
# the fixture PATH (.benchdata/skew1) cannot false-positive
skew_marker = any(
    "skew" in ln.lower()
    for ln in plan_str.splitlines()
    if "Location:" not in ln
)
spark.stop()  # flush the event log

# Restrict task stats to the TIMED jobs (the last n_runs job ids) —
# the warm-up count() would otherwise pollute max-task.
job_stages = {{}}
task_events = []
# Spark 4 event logs are rolling DIRECTORIES (eventlog_v2_*/events_*)
for f in glob.glob(f"{{evdir}}/**", recursive=True):
    if not os.path.isfile(f) or os.path.basename(f).startswith("appstatus"):
        continue
    with open(f) as fh:
        for line in fh:
            if '"Event":"SparkListenerJobStart"' in line:
                ev = json.loads(line)
                job_stages[ev["Job ID"]] = set(ev.get("Stage IDs", []))
            elif '"Event":"SparkListenerTaskEnd"' in line:
                ev = json.loads(line)
                info = ev.get("Task Info", {{}})
                dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                task_events.append((ev.get("Stage ID", -1), dur))

timed_jobs = sorted(job_stages)[-n_runs:]
timed_stages = set().union(*(job_stages[j] for j in timed_jobs)) if timed_jobs else set()
max_task_ms = 0
n_tasks = 0
stage_tasks = {{}}
for sid, dur in task_events:
    if sid not in timed_stages:
        continue
    n_tasks += 1
    max_task_ms = max(max_task_ms, dur)
    stage_tasks[sid] = stage_tasks.get(sid, 0) + 1

print(json.dumps({{"mode": mode, "rows": rows, "min_wall_s": min(walls),
                   "walls": walls, "max_task_ms": max_task_ms,
                   "n_tasks": n_tasks,
                   "max_stage_tasks": max(stage_tasks.values() or [0]),
                   "aqe_skew_marker": skew_marker,
                   "loadavg": round(os.getloadavg()[0], 2)}}))
"""

MODES = ["plain", "salted", "split", "plain_aqe", "jaccard_uncapped", "jaccard_capped"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default=str(_REPO / ".benchdata" / "skew"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--modes", nargs="*", default=MODES)
    args = ap.parse_args()

    results = []
    for mode in args.modes:
        evdir = _REPO / ".benchdata" / f"skew-eventlog-{mode}"
        if evdir.exists():
            shutil.rmtree(evdir)
        evdir.mkdir(parents=True)
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=str(_REPO)),
             mode, args.fixture, str(args.n), str(evdir)],
            capture_output=True, text=True, cwd=_REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if out.returncode != 0 or not line:
            print(json.dumps({"mode": mode, "error": out.stderr[-800:]}))
            return 1
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec))

    print("\n| contender | rows | min wall (s) | max task (ms) | note |")
    print("|---|---|---|---|---|")
    for r in results:
        note = "AQE picked skew join" if r["aqe_skew_marker"] else ""
        print(f"| {r['mode']} | {r['rows']} | {r['min_wall_s']} "
              f"| {r['max_task_ms']} | {note} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
