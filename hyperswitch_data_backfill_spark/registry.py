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
# driver record in a shipped CORRECTNESS_r*.json (enforced by
# tests/test_registry.py::test_driver_window_covers_every_unproven_key,
# extended to rows-only keys in round 5 per the r4 verdict).
#
# The window below is MECHANICALLY DERIVED, not hand-curated (r8 verdict
# item 2 — the r7/r8 hand-listed windows let an executed-looking
# rotation go stale). It is the verbatim output of
#   tools/rotation.suggested_window(50, prepend=_WINDOW_PREPEND,
#                                   max_round=_WINDOW_EVIDENCE_ROUND)
# and tests/test_registry.py::test_driver_window_matches_rotation_output
# fails the suite whenever the committed copy drifts from what the
# shipped CORRECTNESS files say it should be. To regenerate after new
# driver artifacts land: `python tools/rotation.py`, paste, and bump
# _WINDOW_EVIDENCE_ROUND to the newest shipped round.
#
# Prepend hook: evidence files cannot detect a key whose IMPLEMENTATION
# changed since its latest green — list those here by hand and they go
# first, ahead of the age-ranked tail. (New keys need no entry: a key
# with no driver record anywhere ranks first automatically.)
# Round 12: the LSH cosine pair path gets the bucket-size valve +
# multi-probe recall lift (neardup_cosine_lsh, its recall-floor twin,
# and the LSH branch of dedup_semantic_clusters, whose oracle also
# moves from recursive reach-CTE to label propagation); the jaccard /
# levenshtein / containment posting emitters gain per-call
# max_bucket_members knobs, and bounded_broadcast's eager-probe double
# execution is now a documented cost contract (r11 ADVICE; the probe
# itself is unchanged). All re-enter ahead of the tail.
# Round-11 prepends are cleared (their r11 records cover the shipped
# implementations).
_WINDOW_PREPEND: tuple[str, ...] = (
    "neardup_cosine_lsh",
    "neardup_cosine_recall_floor",
    "dedup_semantic_clusters",
    "neardup_levenshtein",
    "dedup_containment",
    "dedup_incremental_jaccard",
    "dedup_span_removal",
    "dedup_ngram_jaccard",
    # r12 query-side multi-probe changed both (floor raised 0.25→0.40)
    "sim_topk",
    "sim_topk_recall_floor",
)

# The newest CORRECTNESS_r*.json round the committed window reflects.
# The rotation tripwire recomputes the suggestion from evidence rounds
# <= this pin (r9 verdict item 2): the driver dropping a NEW artifact
# post-snapshot no longer flips the test red, while a window left
# unrotated for a full round fails the >=2-rounds-behind staleness
# guard in test_registry.py.
_WINDOW_EVIDENCE_ROUND: int = 11

# ROUND-12 WINDOW = rotation output at evidence pin r11 with the eight
# changed-implementation prepends (LSH cosine valve + multi-probe, the
# label-propagation clusters oracle, the posting-emitter knob/probe
# fixes), then the r8-vintage cohort and r9-vintage oldest-first fill.
_DRIVER_WINDOW: list[str] = [
    "neardup_cosine_lsh",  # rows_only r11
    "neardup_cosine_recall_floor",  # green r11
    "dedup_semantic_clusters",  # green r11
    "neardup_levenshtein",  # green r10
    "dedup_containment",  # green r11
    "dedup_incremental_jaccard",  # green r11
    "dedup_span_removal",  # green r8
    "dedup_ngram_jaccard",  # green r8
    "sim_topk",  # rows_only r8
    "sim_topk_recall_floor",  # green r8
    "kafka_wire_v2_roundtrip",  # no evidence
    "dedup_minhash_recall_pairs",  # green r8
    "dedup_simhash_crosscheck",  # green r8
    "dedup_span_ngrams",  # green r8
    "dq_referential_integrity",  # green r8
    "emb_pq_quantize_err",  # green r8
    "graph_pagerank",  # green r8
    "graph_triangle_count",  # green r8
    "join_asof",  # green r8
    "join_asof_tolerance",  # green r8
    "join_broadcast",  # green r8
    "join_skew_salted",  # green r8
    "join_skew_split",  # green r8
    "join_smj",  # green r8
    "layout_zonemap",  # green r8
    "pipeline_corpus_build",  # green r8
    "pipeline_settlement_report",  # green r8
    "sample_temperature_mix",  # green r8
    "sim_ivf",  # rows_only r8
    "sim_ivf_recall_floor",  # green r8
    "sim_ivf_trained",  # rows_only r8
    "sim_ivf_trained_recall_floor",  # green r8
    "sim_ivfpq_recall_floor",  # green r8
    "udf_decrypt",  # green r8
    "win_session",  # green r8
    "win_sliding",  # green r8
    "agg_approx_distinct",  # rows_only r9
    "agg_approx_percentile",  # rows_only r9
    "agg_cube",  # green r9
    "agg_distinct",  # green r9
    "agg_group_count",  # green r9
    "agg_grouping_sets",  # green r9
    "agg_histogram",  # green r9
    "agg_hll_merge",  # rows_only r9
    "agg_mode",  # green r9
    "agg_pivot",  # green r9
    "agg_rollup",  # green r9
    "agg_stats",  # green r9
    "anomaly_zscore",  # green r9
    "count_filtered",  # green r9
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
    import hyperswitch_data_backfill_spark.sinks.kafka_wire_v2  # noqa: F401
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
