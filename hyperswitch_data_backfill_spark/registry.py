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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_operator_modules()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_operator_modules()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


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
    _LOADED = True
