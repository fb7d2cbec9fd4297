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
# The window below is MECHANICALLY DERIVED, not hand-curated (r8 verdict
# item 2 — the r7/r8 hand-listed windows let an executed-looking
# rotation go stale). It is the verbatim output of
#   tools/rotation.suggested_window(50, prepend=_WINDOW_PREPEND)
# and tests/test_registry.py::test_driver_window_matches_rotation_output
# fails the suite whenever the committed copy drifts from what the
# shipped CORRECTNESS files say it should be. To regenerate after new
# driver artifacts land: `python tools/rotation.py` and paste.
#
# Prepend hook: evidence files cannot detect a key whose IMPLEMENTATION
# changed since its latest green — list those here by hand and they go
# first, ahead of the age-ranked tail. (New keys need no entry: a key
# with no driver record anywhere ranks first automatically.)
_WINDOW_PREPEND: tuple[str, ...] = ()

# ROUND-9 WINDOW = rotation output: kafka_wire_roundtrip (new, no
# evidence), the 18-key r4-vintage cohort (the two-rounds-overdue
# rotation the r8 verdict made item 1), then r5-vintage oldest-first
# (rows-only keys included) to fill 50.
_DRIVER_WINDOW: list[str] = [
    "kafka_wire_roundtrip",
    "join_full_outer",
    "json_variant_extract",
    "layout_zorder",
    "money_convert_asof",
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    "scd2_apply",
    "seq_pattern_funnel",
    "seq_pattern_funnel_sessioned",
    "text_bm25",
    "text_collapse_runs",
    "text_inverted_index",
    "text_unigram_logprob",
    "text_vocab_oov",
    "tpch_q3_topk",
    "ts_gapfill",
    "win_ntile",
    "win_time_weighted_avg",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_cube",
    "agg_distinct",
    "agg_group_count",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_hll_merge",
    "agg_mode",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "anomaly_zscore",
    "count_filtered",
    "dedup_minhash",
    "dedup_simhash",
    "emb_pq_quantize",
    "exists_subquery",
    "filter_between",
    "filter_conj",
    "filter_eq",
    "join_anti",
    "join_asof_forward",
    "join_left",
    "join_range",
    "join_semi",
    "limit_k",
    "paginate_window",
    "project_subset",
    "remap_columns",
    "sample_stable_split",
]


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
    import hyperswitch_data_backfill_spark.sinks.kafka_wire  # noqa: F401
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
