"""Focused tests for the r16 optimization internals.

Round-16 rule: an optimization that changes an operator's internals gets
a focused test. Covered here:

- ``catalog.spread_fanout`` — the scale-adaptive fan-out spread (skip
  the repartition when the scan already has >= core-count partitions;
  conservative unconditional repartition for frames with exchanges).
- ``functions.datetime_parse.parse_datetime_multi`` — the length-gated
  fast path must be value-identical to the plain try-formats-in-order
  cascade for every input shape, including invalid nominal-length rows
  and signed wide years.
- ``dedup.shingles_df(with_count=True)`` — the pre-explode ``size()``
  count must equal the post-explode per-doc row count (the window form
  it replaced) and must not perturb the (doc_id, shingle) multiset.
- ``similarity.sim_topk`` — the max-on-scalar collision dedup must emit
  unique (q_id, vec_id) pairs whose cos_sim equals the exact cosine
  recomputed from the embeddings table (the dropDuplicates-on-arrays
  formulation it replaced scored the same arrays after deduping).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


class TestSpreadFanout:
    def test_small_scan_is_spread_to_core_count(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table, spread_fanout

        docs = load_table(spark, SF_DIR, "documents")
        assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
        out = spread_fanout(docs, "doc_id")
        assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    def test_wide_exchange_free_scan_passes_through(self, spark):
        # A range "scan" with 4x the core count in partitions and no
        # exchange below it: the 100 TB shape. Must come back untouched
        # (same object — no repartition, no shuffle added).
        target = spark.sparkContext.defaultParallelism
        from hyperswitch_data_backfill_spark.catalog import spread_fanout

        df = spark.range(0, 1000, 1, target * 4).select(F.col("id").alias("doc_id"))
        out = spread_fanout(df, "doc_id")
        assert out is df

    def test_frame_with_exchange_keeps_conservative_repartition(self, spark):
        # Probing a frame that already contains an exchange would execute
        # its upstream stages under AQE, so spread_fanout must keep the
        # unconditional repartition there.
        target = spark.sparkContext.defaultParallelism
        from hyperswitch_data_backfill_spark.catalog import spread_fanout

        df = (
            spark.range(0, 1000, 1, target * 4)
            .select(F.col("id").alias("doc_id"))
            .repartition(target * 4, "doc_id")
        )
        out = spread_fanout(df, "doc_id")
        assert out is not df
        assert out.rdd.getNumPartitions() == target

    def test_spread_preserves_rows(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table, spread_fanout

        docs = load_table(spark, SF_DIR, "documents")
        assert spread_fanout(docs, "doc_id").count() == docs.count()


class TestParseDatetimeMultiGatedFastPath:
    def test_gated_fast_path_equals_plain_cascade(self, spark):
        from hyperswitch_data_backfill_spark.functions.datetime_parse import (
            FORMATS,
            parse_datetime_multi,
        )

        rows = [
            "2021-03-04 05:06:07.123456",    # 26, valid
            "2021-03-04 05:06:07",           # 19, valid
            "2021-03-04",                    # 10, valid
            "9999-99-99 99:99:99.999999",    # 26, invalid fields
            "2021-13-04 05:06:07",           # 19, invalid month
            "2021-03-99",                    # 10, invalid day
            "0001-01-01 00:00:00.000001",    # 26, minimum year
            "+12345-01-02 03:04:05.678901",  # signed wide year, non-nominal len
            "123456-01-02 03:04:05",         # 6-digit year, len 21 (non-nominal)
            "2021-3-4",                      # short month/day, non-nominal len
            "2021-03-04T05:06:07",           # T separator never matches
            "not a timestamp",
            " 2021-03-04 05:06:07",          # 20 chars, leading space
            "2021-03-04 05:06:07 ",          # 20 chars, trailing space
            "",
            None,
        ]
        df = spark.createDataFrame([(r,) for r in rows], "s string")
        cascade = F.coalesce(
            *[F.try_to_timestamp(F.col("s"), F.lit(fmt)) for fmt in FORMATS]
        ).cast("timestamp_ntz")
        # Compare in-plan (a year-12345 timestamp parses fine in Spark
        # but cannot transit to a Python datetime on collect).
        diverged = (
            df.select(
                "s",
                parse_datetime_multi(F.col("s")).alias("got"),
                cascade.alias("want"),
            )
            .filter(F.expr("got IS DISTINCT FROM want"))
            .select("s")
            .collect()
        )
        assert not diverged, f"fast path diverged on {[r.s for r in diverged]!r}"
        # And the wide-year row must actually parse (proves the cascade
        # tail is load-bearing, not dead code).
        wide = (
            df.filter(F.col("s") == "+12345-01-02 03:04:05.678901")
            .select(parse_datetime_multi(F.col("s")).cast("string").alias("ts"))
            .collect()
        )
        assert wide and wide[0].ts == "+12345-01-02 03:04:05.678901"

    def test_nominal_length_rows_parse(self, spark):
        from hyperswitch_data_backfill_spark.functions.datetime_parse import (
            parse_datetime_multi,
        )

        df = spark.createDataFrame(
            [("2021-03-04 05:06:07.123456",), ("2021-03-04 05:06:07",), ("2021-03-04",)],
            "s string",
        )
        out = df.select(parse_datetime_multi(F.col("s")).alias("ts")).collect()
        assert all(r.ts is not None for r in out)
        assert str(out[0].ts) == "2021-03-04 05:06:07.123456"
        assert str(out[2].ts) == "2021-03-04 00:00:00"


class TestShinglesWithCount:
    def test_n_equals_post_explode_count(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table
        from hyperswitch_data_backfill_spark.operators.dedup import shingles_df

        docs = load_table(spark, SF_DIR, "documents")
        sh = shingles_df(docs, with_count=True)
        bad = (
            sh.groupBy("doc_id", "n")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("n") != F.col("cnt"))
            .count()
        )
        assert bad == 0

    def test_with_count_preserves_shingle_multiset(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table
        from hyperswitch_data_backfill_spark.operators.dedup import shingles_df

        docs = load_table(spark, SF_DIR, "documents")
        plain = shingles_df(docs)
        counted = shingles_df(docs, with_count=True).select("doc_id", "shingle")
        assert plain.exceptAll(counted).count() == 0
        assert counted.exceptAll(plain).count() == 0


class TestPgwireTailRestartGuard:
    def test_injected_stall_restarts_once_and_drains_fully(self, spark, monkeypatch):
        """The r16 liveness guard: a TimeoutError from the stall
        detector triggers ONE query restart, after which the fixture
        still returns the exact full carve (no loss, no duplication)."""
        from hyperswitch_data_backfill_spark.sources import pgwire as pg_mod
        from hyperswitch_data_backfill_spark.streaming import drain as drain_mod

        real = drain_mod.drain_stream
        calls = {"n": 0}

        def flaky(q, progress, target, label, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise TimeoutError("injected stall (test)")
            return real(q, progress, target, label, **kw)

        monkeypatch.setattr(drain_mod, "drain_stream", flaky)
        df = pg_mod.stream_pgwire_tail(spark, SF_DIR)
        carve = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .where("o_orderkey % 300 = 11")
        )
        total = carve.count()
        assert calls["n"] >= 2, "restart path never engaged"
        assert df.count() == total
        assert df.select("o_orderkey").distinct().count() == total


class TestSimTopkScalarDedup:
    def test_pairs_unique_and_scores_exact(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table
        from hyperswitch_data_backfill_spark.functions.arrays import dot, norm
        from hyperswitch_data_backfill_spark.operators.similarity import sim_topk

        out = sim_topk(spark, SF_DIR)
        # A pair colliding in several LSH tables must appear exactly once.
        dupes = (
            out.groupBy("q_id", "vec_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .count()
        )
        assert dupes == 0
        # The max-over-collisions score must be the exact cosine of the
        # two embeddings (identical across collisions by construction).
        emb = load_table(spark, SF_DIR, "embeddings")
        a = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("ea"))
        b = emb.select("vec_id", F.col("embedding").alias("eb"))
        joined = (
            out.join(a, "q_id")
            .join(b, "vec_id")
            .select(
                "q_id",
                "vec_id",
                "cos_sim",
                F.round(
                    dot(F.col("ea"), F.col("eb")) / (norm(F.col("ea")) * norm(F.col("eb"))), 6
                ).alias("exact"),
            )
        )
        bad = joined.filter(F.col("cos_sim") != F.col("exact")).count()
        assert bad == 0
