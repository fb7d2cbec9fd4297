"""Fixture-query registry — the driver-facing operator inventory.

Every operator in SURVEY.md §2 lands here as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent DuckDB oracle SQL string. ``__spark_entry__.py`` exposes this
registry verbatim to the correctness driver.

Contract notes (see __spark_entry__ docstring):
- column names must match between Spark result and oracle SQL — alias
  everything on both sides;
- the value hash is order-insensitive but *exact*, so aggregates over
  doubles are computed via decimal casts (deterministic, engine-neutral)
  or rounded where a float pipeline is inherent (cosine similarity).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class FixtureQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, FixtureQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a fixture query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = FixtureQuery(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# The external correctness driver sweeps at most 50 queries per round, in
# the order queries() yields them.  Rotation policy: once a key is
# driver-green AND its implementation is unchanged, it may drop out of
# the window to make room for unswept or changed keys; every
# oracle-backed key must be either in the window or green in a shipped
# CORRECTNESS_r0*.json (enforced by tests/test_registry.py::
# test_driver_window_covers_every_unproven_key).
#
# ROUND-4 WINDOW (executing the rotation planned in round 3 — r1/r2/r3
# together are 101 distinct driver-hash-green keys, zero regressions):
#   1. the 9 round-3 additions that have judge evidence only;
#   2. round-4 additions (no evidence at all yet);
#   3. the 5 rows-only keys the driver has never recorded (it logs a
#      rows-only check for keys without oracle SQL);
#   4. regression re-checks of the most load-bearing r1/r2-green core —
#      prioritizing keys whose evidence predates the global Arrow
#      batch-size conf change (dedup/pandas-UDF paths) plus the
#      join/agg/window backbone everything composes on.
_DRIVER_WINDOW: list[str] = [
    # -- 1. round-3 additions, judge-green only: need a driver row
    "scd2_apply",
    "layout_zorder",        # + round-4 bigint-overflow hardening: re-verify
    "json_variant_extract",
    "dedup_containment",
    "join_asof_tolerance",
    "seq_pattern_funnel",
    "text_collapse_runs",
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    # -- 2. round-4 additions: zero evidence yet
    "seq_pattern_funnel_sessioned",
    "text_unigram_logprob",
    "text_vocab_oov",
    "dedup_semantic_clusters",
    "join_full_outer",
    "win_ntile",
    "cdc_snapshot_diff",
    "agg_incremental_merge",
    "agg_heavy_hitters",
    "dedup_span_ngrams",
    "graph_pagerank",
    "agg_countmin",
    # -- 2b. round-4 second batch (lakehouse / retrieval / analytics):
    #    zero evidence yet — each evicts one r1/r2-green pure-codegen
    #    regression slot (evictees listed at the bottom; all untouched
    #    since their green evidence was recorded)
    "layout_zonemap",
    "compact_bin_pack",
    "dq_referential_integrity",
    "cdc_apply_changes",
    "win_time_weighted_avg",
    "attr_last_touch",
    "text_bm25",
    "text_inverted_index",
    "agg_equidepth_histogram",
    "graph_triangle_count",
    "money_convert_asof",
    "pipeline_corpus_build",
    "pipeline_settlement_report",
    "ts_gapfill",
    # -- 3. rows-only keys never swept by the driver
    "emb_pq_quantize",
    "sim_topk",
    "sim_ivf",
    "sim_ivf_trained",
    "udf_decrypt",
    "decontam_bloom",
    # -- 4. regression re-checks (r1/r2 evidence, code churn since)
    "tpch_q3_topk",
    "join_broadcast",
    "join_smj",
    "join_asof",
    "join_skew_salted",
    "agg_percentile",
    "agg_salted_skew",
    "dedup_exact",
    "dedup_ngram_jaccard",  # pre-Arrow-conf evidence: re-verify under new conf
    # (rotated out to make room for round-4 additions — all r1/r2-green,
    #  pure-codegen, implementation untouched since their evidence was
    #  recorded: exists_subquery, scalar_subquery_avg, agg_distinct,
    #  agg_mode, win_lag, sample_stable_split, join_asof_forward,
    #  agg_cube, agg_grouping_sets, join_semi, join_left, join_anti,
    #  join_range, agg_group_count, agg_stats, agg_pivot, anomaly_zscore,
    #  win_rank_stats, win_range_frame, agg_rollup, win_running_sum,
    #  win_tumbling, agg_histogram)
]

# ROUND-5 ROTATION PLAN (execute at the start of round 5): once
# CORRECTNESS_r04 lands, every key above has a fresh driver row dated
# after the code that implements it. Round 5's window should then be:
#   1. any round-5 additions (zero evidence) — always first;
#   2. any key whose implementation (or a shared helper it uses)
#      changed after its latest driver row;
#   3. the 19 re-check keys evicted this round (footnote above) —
#      their evidence is r1/r2-vintage and two rounds stale by then;
#   4. remaining slots: oldest-evidence-first regression re-checks.
# The hygiene test (tests/test_registry.py) continues to enforce that
# no oracle-backed key is ever outside window ∪ recorded-green.


def _ordered_names() -> list[str]:
    """Driver-window keys first (stable order), then the rest in
    registration order."""
    window = [n for n in _DRIVER_WINDOW if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(window)]
    return window + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_operator_modules()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    _load_all_operator_modules()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load_all_operator_modules() -> None:
    """Import every module that registers fixture queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Import order = driver sweep order: cheap oracle-backed modules
    # first, expensive approximate/crypto queries last, so a truncated
    # sweep (hard time budget) loses the least oracle evidence.
    import hyperswitch_data_backfill_spark.operators.relational  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.joins  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.aggregates  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.ordering  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.setops  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.windows  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.compaction  # noqa: F401
    import hyperswitch_data_backfill_spark.functions.datetime_parse  # noqa: F401
    import hyperswitch_data_backfill_spark.functions.json_fns  # noqa: F401
    import hyperswitch_data_backfill_spark.functions.money  # noqa: F401
    import hyperswitch_data_backfill_spark.functions.arrays  # noqa: F401
    import hyperswitch_data_backfill_spark.sinks.kafka  # noqa: F401
    import hyperswitch_data_backfill_spark.plans.spec  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.text  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.corpus  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.analytics  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.graph  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.multimodal  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.dedup  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.similarity  # noqa: F401
    import hyperswitch_data_backfill_spark.functions.crypto  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.layout  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.lakehouse  # noqa: F401
    _LOADED = True
