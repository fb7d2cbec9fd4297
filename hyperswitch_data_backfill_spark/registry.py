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
# ROUND-6 WINDOW (executing the rotation recorded in round 5; evidence
# ages computed from shipped CORRECTNESS_r01–r05 by tools/rotation.py):
#   1. round-6 additions / changed implementations first —
#      stream_tumbling_replay (NEW: win_tumbling's watermarked
#      streaming twin run as a live append-mode StreamingQuery;
#      sf0.01-swept green locally before shipping);
#   2. set_intersect_all — the one r2-vintage key (three rounds stale;
#      its r5 eviction is repaid first, per the r5 verdict);
#   3. the round-3-vintage cohort, oldest-first alphabetical (the
#      compaction/functions/text/analytics/multimodal r3 batch),
#      filling the 50 slots. win_session/win_sliding and the r3 tail
#      past 50 slots roll to round 7 (recorded below).
_DRIVER_WINDOW: list[str] = [
    "stream_tumbling_replay",
    "set_intersect_all",
    "agg_corr_moments",
    "agg_unpivot",
    "array_ops",
    "compact_latest",
    "date_trunc_bucket",
    "decontam_ngram",
    "dedup_clusters",
    "dedup_exact_hashkey",
    "dedup_survivors",
    "emb_centroid_per_label",
    "emb_quantize_int8",
    "emb_random_projection",
    "funnel_steps",
    "json_extract",
    "json_extract_agg",
    "json_serialize",
    "kafka_payload_shape",
    "map_props_stats",
    "math_money",
    "merge_upsert",
    "multimodal_audio_rms",
    "multimodal_frame_sample",
    "multimodal_resize_mean",
    "neardup_cosine",
    "neardup_levenshtein",
    "pack_sequences",
    "parse_datetime_multi",
    "pipeline_backfill_job",
    "pipeline_clean_corpus",
    "profile_columns",
    "retention_cohort",
    "sample_weighted_mix",
    "scd2_intervals",
    "sim_exact_small",
    "text_chunk_overlap",
    "text_fingerprint",
    "text_lang_id",
    "text_length_quantile_gate",
    "text_ngram_freq",
    "text_pii_redact",
    "text_quality",
    "text_repetition_gate",
    "text_stats",
    "text_tfidf",
    "text_token_count_bpe",
    "text_tokens",
    "win_first_last",
    "win_gap_islands",
]

# ROUND-7 ROTATION PLAN: after CORRECTNESS_r06 lands, the oldest
# evidence is the r3-vintage tail that missed this window —
# win_session, win_sliding, plus the r4-vintage cohort. Round 7's
# window: any r7 additions/changes first, then win_session +
# win_sliding, then r4-vintage keys oldest-first to fill 50.
# `python tools/rotation.py` computes this from the shipped
# CORRECTNESS files (it cannot detect changed implementations —
# prepend those by hand).
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
