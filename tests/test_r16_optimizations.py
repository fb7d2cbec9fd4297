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


class TestSimhashRowLocal:
    """simhash_signatures computes bit votes row-locally (no explode,
    no groupBy) — must be value-identical to the explode+32-buffer
    aggregate it replaced, including empty-token and duplicate-token
    documents."""

    def _reference_sigs(self, docs):
        tok = docs.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token"),
        )
        h = F.xxhash64("token")
        bit_votes = [
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(32)
        ]
        votes = tok.groupBy("doc_id").agg(*bit_votes)
        fp = sum(
            F.when(F.col(f"b{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
            for j in range(32)
        )
        return votes.select("doc_id", fp.cast("bigint").alias("simhash"))

    def test_signatures_match_explode_reference(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table
        from hyperswitch_data_backfill_spark.operators.dedup import simhash_signatures

        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        edge = spark.createDataFrame(
            [
                (10_000_001, ""),          # no tokens -> no signature row
                (10_000_002, "   "),       # whitespace-only -> none either
                (10_000_003, "solo"),
                (10_000_004, "a a a b"),   # duplicate tokens vote repeatedly
            ],
            "doc_id long, text string",
        )
        docs = docs.unionByName(edge)
        ref = self._reference_sigs(docs)
        new = simhash_signatures(docs)
        assert new.count() == ref.count()
        mismatch = (
            ref.unionByName(new)
            .groupBy("doc_id", "simhash")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") != 2)
            .count()
        )
        assert mismatch == 0


class TestFusedHammingCut:
    """The bit_count cut fused into the pair-expansion generator must
    emit exactly the pair set of the expand-then-filter form."""

    def _reference_pairs(self, sigs, max_hamming=3):
        fp = F.col("simhash")
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(fp, b * 8).bitwiseAND(F.lit(255)).alias("bits"),
                )
                for b in range(4)
            ]
        )
        banded = sigs.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
            "doc_id", "simhash", "b.band", "b.bits"
        )
        buckets = (
            banded.groupBy("band", "bits")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("doc_id", "simhash"))
                ).alias("members")
            )
            .filter(F.size("members") > 1)
        )
        ps = F.expr(
            """
            flatten(transform(sequence(0, size(members) - 2), i ->
                transform(sequence(i + 1, size(members) - 1), j ->
                    struct(members[i] AS a, members[j] AS b))))
            """
        )
        hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        return (
            buckets.select(F.explode(ps).alias("p"))
            .select(
                F.col("p.a.doc_id").alias("id_a"),
                F.col("p.b.doc_id").alias("id_b"),
                F.col("p.a.simhash").alias("sim_a"),
                F.col("p.b.simhash").alias("sim_b"),
            )
            .withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b", "hamming")
        )

    def test_simhash_pairs_match_expand_then_filter(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table
        from hyperswitch_data_backfill_spark.operators.dedup import (
            simhash_pairs,
            simhash_signatures,
        )

        docs = load_table(spark, SF_DIR, "documents")
        sigs = simhash_signatures(docs).localCheckpoint(eager=True)
        ref = self._reference_pairs(sigs)
        new = simhash_pairs(sigs)
        assert new.count() == ref.count()
        mismatch = (
            ref.unionByName(new)
            .groupBy("id_a", "id_b", "hamming")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") != 2)
            .count()
        )
        assert mismatch == 0

    def test_fingerprint_pairs_respect_fused_cut(self, spark):
        # hand-built 64-bit fingerprints: 2 within Hamming 6 of each
        # other, 1 far away — the fused generator must emit exactly the
        # close pair with its true distance.
        from hyperswitch_data_backfill_spark.operators.perceptual import (
            fingerprint_pairs,
        )

        base = 0x0123_4567_89AB_CDEF
        sigs = spark.createDataFrame(
            [
                (1, base),
                (2, base ^ 0b101),            # hamming 2 from base
                (3, base ^ ((1 << 62) | (1 << 31) | (1 << 15) | 0xFF)),
            ],
            "media_id long, dhash long",
        )
        out = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in fingerprint_pairs(sigs, max_hamming=3).collect()
        }
        assert out == {(1, 2): 2}


class TestProfileColumnsPerColumn:
    """profile_columns' per-column groupBy union must reproduce the
    single-aggregate multi-distinct answer, without an Expand node."""

    def test_values_match_single_aggregate(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table
        from hyperswitch_data_backfill_spark.operators.analytics import (
            _PROFILE_COLS,
            profile_columns,
        )

        orders = load_table(spark, SF_DIR, "orders")
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in _PROFILE_COLS:
            aggs += [
                F.count(c).alias(f"nn_{c}"),
                F.count_distinct(c).alias(f"nd_{c}"),
                F.min(c).cast("string").alias(f"mn_{c}"),
                F.max(c).cast("string").alias(f"mx_{c}"),
            ]
        ref_row = orders.agg(*aggs).collect()[0]
        out = {r["col_name"]: r for r in profile_columns(spark, SF_DIR).collect()}
        assert set(out) == set(_PROFILE_COLS)
        for c in _PROFILE_COLS:
            r = out[c]
            assert r["n_rows"] == ref_row["_n"]
            assert r["n_nonnull"] == ref_row[f"nn_{c}"]
            assert r["n_distinct"] == ref_row[f"nd_{c}"]
            assert r["min_val"] == ref_row[f"mn_{c}"]
            assert r["max_val"] == ref_row[f"mx_{c}"]

    def test_no_expand_in_plan(self, spark):
        from hyperswitch_data_backfill_spark.operators.analytics import profile_columns

        df = profile_columns(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the old multi-distinct form planned an Expand (x7 row
        # duplication) into SortAggregates keyed on the 6-column
        # composite; the per-column form needs neither. (Tiny
        # second-level SortAggregates over the 3-5 group rows remain
        # for the string-typed min/max buffers — those are not the
        # full-table sort the assertion guards against, so only the
        # Expand is pinned.)
        assert "Expand" not in plan


class TestApproxDistinctDedupFirst:
    """agg_approx_distinct_err dedupes (group, key) before both legs —
    legal because HLL++ is duplicate-insensitive; the (ap, ex) pair must
    match the mixed countDistinct/sketch aggregate it replaced."""

    def test_estimates_and_exacts_match_reference(self, spark):
        from hyperswitch_data_backfill_spark.catalog import load_table
        from hyperswitch_data_backfill_spark.operators.aggregates import (
            APPROX_DISTINCT_CARVE_MOD,
        )

        orders = load_table(spark, SF_DIR, "orders")
        bucket = F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10
        ).cast("long") % APPROX_DISTINCT_CARVE_MOD
        carved = orders.where(bucket == 0)
        ref = carved.groupBy("o_orderstatus").agg(
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("ap"),
            F.countDistinct("o_custkey").alias("ex"),
        )
        new = (
            carved.select("o_orderstatus", "o_custkey")
            .distinct()
            .groupBy("o_orderstatus")
            .agg(
                F.approx_count_distinct("o_custkey", rsd=0.01).alias("ap"),
                F.count("o_custkey").alias("ex"),
            )
        )
        mismatch = (
            ref.unionByName(new)
            .groupBy("o_orderstatus", "ap", "ex")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") != 2)
            .count()
        )
        assert mismatch == 0
