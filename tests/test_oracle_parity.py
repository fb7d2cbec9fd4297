"""The repo's own mirror of the driver's correctness gate: every
registered fixture query with an oracle must match DuckDB on the same
parquet; rows-only queries must at least run and keep a stable schema."""

from __future__ import annotations

import pytest

from hyperswitch_data_backfill_spark.registry import REGISTRY, queries, oracle_sql
from tests.conftest import SF_DIR, assert_oracle_match

queries()  # force registration


_WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
_ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_query(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_oracle_match(df, duck, q.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0
    # driver-canonicalizer safety: the rows-only checker pandas-sorts
    # over ALL columns, and array/struct/map cells are unhashable there
    # (emb_pq_quantize's r4 red row was exactly this — pack nested
    # values into ints or delimited strings for the registered key)
    offending = [
        (c, t) for c, t in df.dtypes if t.startswith(("array", "struct", "map"))
    ]
    assert not offending, (
        f"rows-only key {name} returns canonicalizer-unsafe columns: {offending}"
    )


def test_registry_contract():
    qs = queries()
    os_ = oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40, f"operator inventory too small: {len(qs)}"


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"key", "value", "topic"}
