"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side result transfer), which is the honest proxy for "write this
result to Kafka/parquet" — what the engine does in production.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOAD_AT_START = os.getloadavg()

# Representative spread of the operator inventory: relational parity
# (scan/filter/join/agg/window/pagination), the Kafka event projection,
# and the LLM-pipeline operators (dedup tiers, similarity, text).
HEADLINE = [
    "kafka_payload_shape",
    "filter_conj",
    "join_broadcast",
    "join_smj",
    "join_asof",
    "agg_stats",
    "agg_group_count",
    "agg_rollup",
    "agg_percentile",
    "topk_per_group",
    "win_running_sum",
    "win_tumbling",
    "win_session",
    "json_extract_agg",
    "parse_datetime_multi",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "sim_exact_small",
    "sim_topk",
    "sim_ivf",
    "sample_stable_split",
    "text_tokens",
    "text_stats",
    "text_fingerprint",
    "pipeline_clean_corpus",
]


def main() -> None:
    from hyperswitch_data_backfill_spark.registry import REGISTRY, queries
    from hyperswitch_data_backfill_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench")
    queries()

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # JVM/codegen + Python-worker warmup outside the timed region (the
    # first pandas UDF of a session pays worker spawn + pandas import).
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    import pandas as pd  # noqa: F401

    warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(warm(F.col("id"))).write.format("noop").mode("overwrite").save()

    # Steady-state protocol: one UNTIMED warm-up execution per query
    # (absorbs whole-stage-codegen compilation and first-touch heap
    # page faults — both one-time costs that amortize to zero on a
    # long-running cluster), then best-of-2 timed runs. Measured on this
    # harness: the first execution of a nested-higher-order-function
    # plan can cost 5-40× its steady state purely in JIT/codegen.
    # Three full sweeps (min per query across sweeps): the local JVM
    # shows roaming multi-second JIT/GC stalls per pass that land on
    # arbitrary queries; they rarely recur on the same query twice, so
    # the cross-sweep min reports the engine's actual cost. (Two sweeps
    # still showed 2× swings on individual queries; three stabilize.)
    timings: dict[str, float] = {name: float("inf") for name in HEADLINE}
    for sweep in range(3):
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            if sweep == 0:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(min(timings[name], time.perf_counter() - t0), 3)
            if sweep == 2:
                print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Machine-state receipt: two consecutive driver rounds disagreed with
    # idle-machine runs in opposite directions (±30% envelope, see
    # BENCH_NOTES.md). loadavg at start+end makes driver-vs-builder
    # deltas attributable to contention instead of guessed at.
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "loadavg_start": [round(x, 2) for x in LOAD_AT_START],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
