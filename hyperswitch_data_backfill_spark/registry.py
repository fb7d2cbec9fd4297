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
# Round 11: neardup_cosine (exact pipeline rebuilt on the blocked-BLAS
# candidate kernel + re-score) and dedup_semantic_clusters (pair stage
# routed through the same kernel with the LSH fallback probe) changed
# implementation after their last green, as did the four token-explode
# text ops not already in the age-ranked window (spread_docs
# pre-explode repartition); all re-enter ahead of the tail.
# kafka_wire_roundtrip's r10 prepend is cleared (its r10 record covers
# the current implementation).
_WINDOW_PREPEND: tuple[str, ...] = (
    "neardup_cosine",
    "dedup_semantic_clusters",
    "text_unigram_logprob",
    "text_vocab_oov",
    "text_bm25",
    "text_inverted_index",
    # in-plan posting valve added to its banding (round-11 review fix)
    "dedup_simhash",
)

# The newest CORRECTNESS_r*.json round the committed window reflects.
# The rotation tripwire recomputes the suggestion from evidence rounds
# <= this pin (r9 verdict item 2): the driver dropping a NEW artifact
# post-snapshot no longer flips the test red, while a window left
# unrotated for a full round fails the >=2-rounds-behind staleness
# guard in test_registry.py.
_WINDOW_EVIDENCE_ROUND: int = 10

# ROUND-11 WINDOW = rotation output at evidence pin r10 with the seven
# changed-implementation prepends (blocked-BLAS cosine kernel rebuilds,
# the four spread_docs token-explode text ops, the simhash valve), the
# two new LSH pair keys (no evidence), then the r6-vintage cohort and
# r8-vintage oldest-first fill.
_DRIVER_WINDOW: list[str] = [
    "neardup_cosine",  # green r10
    "dedup_semantic_clusters",  # green r8
    "text_unigram_logprob",  # green r9
    "text_vocab_oov",  # green r9
    "text_bm25",  # green r9
    "text_inverted_index",  # green r9
    "dedup_simhash",  # rows_only r9
    "neardup_cosine_lsh",  # no evidence
    "neardup_cosine_recall_floor",  # no evidence
    "profile_columns",  # green r6
    "retention_cohort",  # green r6
    "sample_weighted_mix",  # green r6
    "scd2_intervals",  # green r6
    "set_intersect_all",  # green r6
    "sim_exact_small",  # green r6
    "stream_tumbling_replay",  # green r6
    "text_chunk_overlap",  # green r6
    "text_fingerprint",  # green r6
    "text_lang_id",  # green r6
    "text_length_quantile_gate",  # green r6
    "text_ngram_freq",  # green r6
    "text_pii_redact",  # green r6
    "text_quality",  # green r6
    "text_repetition_gate",  # green r6
    "text_stats",  # green r6
    "text_tfidf",  # green r6
    "text_token_count_bpe",  # green r6
    "text_tokens",  # green r6
    "win_first_last",  # green r6
    "win_gap_islands",  # green r6
    "agg_approx_distinct_err",  # green r8
    "agg_approx_percentile_err",  # green r8
    "agg_countmin",  # green r8
    "agg_equidepth_histogram",  # green r8
    "agg_heavy_hitters",  # green r8
    "agg_hll_merge_err",  # green r8
    "agg_incremental_merge",  # green r8
    "agg_percentile",  # green r8
    "agg_salted_skew",  # green r8
    "attr_last_touch",  # green r8
    "cdc_apply_changes",  # green r8
    "cdc_snapshot_diff",  # green r8
    "compact_bin_pack",  # green r8
    "decontam_bloom",  # rows_only r8
    "decontam_bloom_fn",  # green r8
    "dedup_containment",  # green r8
    "dedup_exact",  # green r8
    "dedup_incremental_exact",  # green r8
    "dedup_incremental_jaccard",  # green r8
    "dedup_minhash_precision",  # green r8
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
