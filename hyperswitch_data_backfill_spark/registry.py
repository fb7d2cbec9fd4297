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
# the order queries() yields them.  Rounds 1-2 covered the relational /
# join / aggregate / window core (all green in CORRECTNESS_r01/r02); the
# 53 remaining keys had zero driver evidence.  _DRIVER_WINDOW therefore
# front-loads exactly 50 keys this round: the 49 never-swept oracle-backed
# queries plus win_session (red in r1/r2 from a DuckDB HUGEINT-vs-BIGINT
# oracle type bug, now fixed — needs a green re-check).  Evidence for the
# already-green core persists from prior rounds.  Rotation policy: once a
# key is driver-green AND its implementation is unchanged, it may drop out
# of the window to make room for unswept or changed keys.
# ROUND-4 ROTATION PLAN (written round 3): once CORRECTNESS_r03 lands
# green for this window, rotate in the keys still without driver
# evidence — the round-3 additions (multimodal_png_roundtrip,
# multimodal_wav_roundtrip, json_variant_extract, layout_zorder) and
# the 9 rows-only keys (driver records a rows-only check) — then fill
# the remaining ~37 slots with the most load-bearing r1/r2-green keys
# as a regression re-check (tpch_q3_topk, join_*, agg_*, win_* core).
_DRIVER_WINDOW: list[str] = [
    "win_session",          # red r1/r2: oracle type bug fixed, re-verify first
    "win_first_last",
    "win_sliding",
    "compact_latest",
    "merge_upsert",
    "scd2_intervals",
    "parse_datetime_multi",
    "json_extract",
    "json_extract_agg",
    "map_props_stats",      # oracle CAST fix this round — verify
    "math_money",
    "date_trunc_bucket",
    "array_ops",
    "emb_quantize_int8",
    "emb_random_projection",  # oracle CAST fix this round — verify
    "kafka_payload_shape",
    "json_serialize",
    "pipeline_backfill_job",
    "text_tokens",
    "text_stats",
    "text_quality",
    "text_fingerprint",
    "text_lang_id",
    "text_token_count_bpe",
    "pipeline_clean_corpus",
    "text_tfidf",
    "text_ngram_freq",
    "text_length_quantile_gate",
    "text_chunk_overlap",
    "text_pii_redact",
    "text_repetition_gate",
    "decontam_ngram",
    "sample_weighted_mix",
    "pack_sequences",
    "win_gap_islands",
    "funnel_steps",
    "retention_cohort",
    "agg_corr_moments",
    "agg_unpivot",
    "profile_columns",
    "multimodal_resize_mean",
    "multimodal_frame_sample",
    "multimodal_audio_rms",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_exact_hashkey",
    "neardup_levenshtein",
    "sim_exact_small",
    "neardup_cosine",
    "emb_centroid_per_label",
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
    import hyperswitch_data_backfill_spark.plans.spec  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.text  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.corpus  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.analytics  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.multimodal  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.dedup  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.similarity  # noqa: F401
    import hyperswitch_data_backfill_spark.functions.crypto  # noqa: F401
    import hyperswitch_data_backfill_spark.operators.layout  # noqa: F401
    _LOADED = True
