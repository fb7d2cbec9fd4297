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
# the window to make room for unswept or changed keys; every key —
# oracle-backed AND rows-only — must be either in the window or have a
# driver record in a shipped CORRECTNESS_r0*.json (enforced by
# tests/test_registry.py::test_driver_window_covers_every_unproven_key,
# extended to rows-only keys in round 5 per the r4 verdict).
#
# ROUND-5 WINDOW (executing the rotation recorded in round 4; evidence
# ages computed from shipped CORRECTNESS_r01–r04):
#   1. evidence-gap / changed / new keys first — emb_pq_quantize (r4's
#      one red row; impl changed this round to emit a packed bigint),
#      sim_ivfpq + agg_hll_merge (registered post-r4-window, zero
#      driver evidence), stream_cdc_maintainer_batch (new this round),
#      agg_approx_percentile (rows-only r2, never re-swept — r4
#      verdict item 5);
#   2. the 4 keys whose latest evidence is round-1 vintage;
#   3. all 41 keys whose latest evidence is round-2 vintage (the 23
#      r4-evicted keys plus the rest of the r2 cohort) — exactly fills
#      the 50 slots. After this sweep no key's evidence is older than
#      round 3.
_DRIVER_WINDOW: list[str] = [
    # -- 1. evidence gaps (red / never-swept / new / stale-rows-only)
    "emb_pq_quantize",        # r4 ERR (unhashable array) → now packed bigint
    "sim_ivfpq",              # zero driver evidence
    "agg_hll_merge",          # zero driver evidence
    "stream_cdc_maintainer_batch",  # new in round 5
    "stream_attribution_replay",    # new in round 5 (live streaming query)
    "agg_approx_percentile",  # rows-only r2; envelope pytest added r5
    # -- 2. round-1-vintage evidence
    "win_rank_stats",
    "win_range_frame",
    "dedup_minhash",
    "dedup_simhash",
    # -- 3. round-2-vintage evidence (oldest-first cohort, fills to 50)
    "scan_orders",
    "scan_customer_page",
    "count_filtered",
    "filter_eq",
    "filter_between",
    "filter_conj",
    "project_subset",
    "validate_ids",
    "remap_columns",
    "exists_subquery",
    "scalar_subquery_avg",
    "join_semi",
    "join_left",
    "join_anti",
    "join_range",
    "join_asof_forward",
    "agg_group_count",
    "agg_stats",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_histogram",
    "agg_mode",
    "anomaly_zscore",
    "sample_stable_split",
    "sample_stratified_fixed",
    "sort_by_key",
    "limit_k",
    "paginate_window",
    "topk_per_group",
    "set_union",
    "set_intersect",
    "set_except",
    # (set_intersect_all — r2-green, pure codegen, untouched — evicted
    #  to round 6 to make room for stream_attribution_replay; it is the
    #  only r2-cohort key not re-checked this round)
    "win_rownum",
    "win_lag",
    "win_running_sum",
    "win_tumbling",
]

# ROUND-6 ROTATION PLAN: after CORRECTNESS_r05 lands, every key's
# evidence is round-3 vintage or newer. Round 6's window should be:
#   1. any round-6 additions / implementation changes — always first;
#   2. the round-3-vintage cohort (win_session, win_first_last,
#      win_sliding, the compaction/functions/text/analytics/multimodal
#      r3 batch — ~47 keys), oldest-first, filling the 50 slots.
# `python tools/rotation.py` computes evidence ages from the shipped
# CORRECTNESS files and prints this ordering ready to paste (it cannot
# detect changed implementations — prepend those by hand).
# The hygiene test continues to enforce that no key (oracle-backed or
# rows-only) is ever outside window ∪ recorded-driver-evidence.


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
