"""Quickstart: the three headline pipelines, end to end.

Run: python examples/quickstart.py [sf_dir]   (default sf0.001, ~1 min)

1. Payments backfill — the reference's job: scan orders in a window,
   project Kafka event records (key/value/topic).
2. LLM corpus build — gate → dedup → near-dup drop → decontam → pack.
3. Settlement report — as-of FX conversion → daily rollup → deltas.
4. Vector search — IVF-PQ approximate nearest neighbors.

Every one of these is also a registered fixture query verified against
a DuckDB oracle (see INVENTORY.md); this script is the human-facing
tour of the same entry points.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from hyperswitch_data_backfill_spark.registry import REGISTRY, queries
from hyperswitch_data_backfill_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")
    queries()

    print("\n=== 1. Kafka event projection (the reference's backfill) ===")
    REGISTRY["kafka_payload_shape"].fn(spark, sf_dir).show(3, truncate=60)

    print("=== 2. LLM corpus build (gate→dedup→decontam→pack) ===")
    REGISTRY["pipeline_corpus_build"].fn(spark, sf_dir).show(5)

    print("=== 3. Daily settlement report (as-of FX + deltas) ===")
    REGISTRY["pipeline_settlement_report"].fn(spark, sf_dir).orderBy(
        "ccy", "day"
    ).show(5)

    print("=== 4. IVF-PQ vector search (top-k per query) ===")
    REGISTRY["sim_ivfpq"].fn(spark, sf_dir).orderBy("q_id", "rk").show(5)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
