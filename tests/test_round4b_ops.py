"""Property tests for the round-4 second batch (lakehouse / retrieval /
analytics operators), beyond the auto-parametrized oracle parity in
test_oracle_parity.py:

- layout_zonemap: pruning is SOUND — every row matching the probe
  predicate lives in a chunk flagged may_contain (a false-negative
  zone map silently drops data at scan time, the one unforgivable bug).
- compact_bin_pack: bins respect the first-fit size bound
  (target + largest file), cover all files, and conserve bytes.
- dq_referential_integrity: zero orphans on the consistent fixture and
  exact counts when orphans are injected.
- cdc_apply_changes: tombstoned keys vanish, untouched keys pass
  through with base balances, updated keys carry their latest order's
  balance.
- win_time_weighted_avg: mean-value bound — each user's TWA lies
  within [min, max] of that user's event values.
- attr_last_touch: attributed touches precede the purchase, belong to
  the same user, fall within the lookback, and are never purchases.
- text_bm25: ranks are 1..K consecutive with non-increasing scores.
- text_inverted_index: df equals the true distinct-doc count and the
  postings head is the sorted prefix.
- agg_equidepth_histogram: equal-depth (+/-1) buckets with ordered,
  non-overlapping bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.operators.lakehouse import (
    PACK_TARGET_BYTES,
    ZONE_HI_CENTS,
    ZONE_LO_CENTS,
)
from hyperswitch_data_backfill_spark.registry import REGISTRY, queries
from tests.conftest import SF_DIR

queries()  # force registration


def test_zonemap_pruning_is_sound(spark):
    zm = REGISTRY["layout_zonemap"].fn(spark, SF_DIR)
    orders = load_table(spark, SF_DIR, "orders")
    from hyperswitch_data_backfill_spark.operators.lakehouse import ZONE_CHUNK

    matching_chunks = (
        orders.withColumn("cents", F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .filter(F.col("cents").between(ZONE_LO_CENTS, ZONE_HI_CENTS))
        .select(
            F.floor(F.col("o_orderkey") / ZONE_CHUNK).cast("bigint").alias("chunk_id")
        )
        .distinct()
    )
    # every chunk that truly contains a matching row must be flagged
    missed = matching_chunks.join(
        zm.filter(F.col("may_contain")).select("chunk_id"), "chunk_id", "left_anti"
    )
    assert missed.count() == 0
    # and row counts must conserve the table
    assert zm.agg(F.sum("n_rows")).collect()[0][0] == orders.count()


def test_bin_pack_respects_first_fit_bound(spark):
    packed = REGISTRY["compact_bin_pack"].fn(spark, SF_DIR).collect()
    total = sum(r["file_bytes"] for r in packed)
    max_file = max(r["file_bytes"] for r in packed)
    bins: dict[int, int] = {}
    for r in packed:
        bins[r["bin_id"]] = bins.get(r["bin_id"], 0) + r["file_bytes"]
        assert r["bin_bytes"] >= r["file_bytes"]
    assert sum(bins.values()) == total
    # cumulative-bucketing bound: a bin overshoots target by < one file
    for b, size in bins.items():
        assert size <= PACK_TARGET_BYTES + max_file, (b, size)
    # bins are dense 0..max
    assert sorted(bins) == list(range(len(bins)))


def test_referential_integrity_counts(spark):
    out = {r["relation"]: r for r in REGISTRY["dq_referential_integrity"].fn(spark, SF_DIR).collect()}
    li_n = load_table(spark, SF_DIR, "lineitem").count()
    o_n = load_table(spark, SF_DIR, "orders").count()
    assert out["lineitem->orders"]["child_rows"] == li_n
    assert out["orders->customer"]["child_rows"] == o_n
    # the generated fixture is referentially consistent
    assert all(r["orphan_rows"] == 0 for r in out.values())


def test_referential_integrity_detects_injected_orphans(spark):
    # drop 10% of orders, then orphaned lineitems must be counted exactly
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderkey") % 10 != 0)
    orphans = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    ).count()
    expected = li.filter(F.col("l_orderkey") % 10 == 0).count()
    assert orphans == expected and orphans > 0


def test_cdc_apply_semantics(spark):
    out = REGISTRY["cdc_apply_changes"].fn(spark, SF_DIR)
    orders = load_table(spark, SF_DIR, "orders")
    base = load_table(spark, SF_DIR, "customer")
    latest = (
        orders.select(
            F.col("o_custkey").alias("k"),
            F.struct(
                "o_orderdate", "o_orderkey",
                F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
            ).alias("ch"),
        )
        .groupBy("k")
        .agg(F.max("ch").alias("ch"))
        .select("k", F.col("ch.op").alias("op"))
    )
    deleted = set(r["k"] for r in latest.filter(F.col("op") == "D").collect())
    out_keys = set(r["c_custkey"] for r in out.collect())
    assert not (deleted & out_keys), "tombstoned keys leaked into the snapshot"
    # untouched base keys pass through with their base balance (cents)
    untouched = (
        base.join(latest, base.c_custkey == latest.k, "left_anti")
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        )
    )
    joined = untouched.join(
        out.select("c_custkey", "acctbal_cents", "last_op"), "c_custkey"
    )
    assert joined.filter(
        (F.col("cents") != F.col("acctbal_cents")) | F.col("last_op").isNotNull()
    ).count() == 0


def test_twa_within_value_bounds(spark):
    twa = REGISTRY["win_time_weighted_avg"].fn(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    bounds = ev.groupBy("user_id").agg(
        F.min(F.round(F.col("value") * 100).cast("bigint")).alias("lo"),
        F.max(F.round(F.col("value") * 100).cast("bigint")).alias("hi"),
    )
    bad = twa.join(bounds, "user_id").filter(
        (F.col("twa_cents") < F.col("lo")) | (F.col("twa_cents") > F.col("hi"))
    )
    assert bad.count() == 0


def test_last_touch_attribution_validity(spark):
    from hyperswitch_data_backfill_spark.operators.analytics import ATTR_WINDOW_US

    out = REGISTRY["attr_last_touch"].fn(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").alias("touch_event_id"),
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("t_type"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    attributed = out.filter(F.col("touch_event_id").isNotNull()).join(
        ev, "touch_event_id"
    )
    purchases = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").alias("purchase_event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
    )
    j = attributed.join(purchases, "purchase_event_id")
    assert j.filter(F.col("t_user") != F.col("user_id")).count() == 0
    assert j.filter(F.col("t_type") == "purchase").count() == 0
    assert j.filter(F.col("t_us") >= F.col("p_us")).count() == 0
    assert j.filter((F.col("p_us") - F.col("t_us")) > ATTR_WINDOW_US).count() == 0
    # every purchase is represented exactly once
    n_purchases = (
        load_table(spark, SF_DIR, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert out.count() == n_purchases
    assert out.select("purchase_event_id").distinct().count() == n_purchases


def test_bm25_ranks_consecutive_and_monotone(spark):
    rows = sorted(
        REGISTRY["text_bm25"].fn(spark, SF_DIR).collect(), key=lambda r: r["rk"]
    )
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert all(s > 0 for s in scores)


def test_inverted_index_postings_are_sorted_true_prefix(spark):
    from hyperswitch_data_backfill_spark.operators.text import (
        INVIDX_POSTING_CAP,
        tokens,
    )

    idx = {r["token"]: r for r in REGISTRY["text_inverted_index"].fn(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents")
    truth = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .distinct()
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("docs"),
        )
        .collect()
    )
    for r in truth:
        if r["df"] < 2:
            assert r["token"] not in idx
            continue
        got = idx[r["token"]]
        assert got["df"] == r["df"]
        expect = ",".join(str(d) for d in r["docs"][:INVIDX_POSTING_CAP])
        assert got["postings_head"] == expect


def test_equidepth_buckets_balanced_and_ordered(spark):
    rows = sorted(
        REGISTRY["agg_equidepth_histogram"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bucket"],
    )
    counts = [r["n"] for r in rows]
    assert max(counts) - min(counts) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]
        assert a["lo_cents"] <= a["hi_cents"]


def test_corpus_build_stage_containment(spark):
    """pipeline_corpus_build: every output doc passed each stage —
    within the gate bounds, an exact-dedup survivor (lowest id for its
    text), NOT the loser of any jaccard pair, not benchmark-tainted;
    and the packed output covers exactly the clean set (one row per
    surviving doc, offsets consistent with per-source token cumsum)."""
    from hyperswitch_data_backfill_spark.operators.corpus import (
        BUILD_GATE_HI,
        BUILD_GATE_LO,
        DECONTAM_BENCH_MOD,
        PACK_BUDGET,
    )
    from hyperswitch_data_backfill_spark.operators.dedup import jaccard_pairs

    out = REGISTRY["pipeline_corpus_build"].fn(spark, SF_DIR)
    rows = out.collect()
    docs = load_table(spark, SF_DIR, "documents")
    gated = docs.filter(F.col("n_chars").between(BUILD_GATE_LO, BUILD_GATE_HI))
    from pyspark.sql.window import Window as W

    exact = (
        gated.withColumn(
            "rn", F.row_number().over(W.partitionBy("text").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    exact_ids = {r["doc_id"] for r in exact.select("doc_id").collect()}
    losers = {
        r["id_b"] for r in jaccard_pairs(exact).select("id_b").collect()
    }
    out_ids = {r["doc_id"] for r in rows}
    assert out_ids <= exact_ids
    assert not (out_ids & losers)
    assert all(r["doc_id"] % DECONTAM_BENCH_MOD != 0 for r in rows)
    # packing consistency: per source, offsets advance by n_tokens mod budget
    by_source: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        cum = 0
        for r in rs:
            assert r["seq_id"] == cum // PACK_BUDGET, (src, r)
            assert r["offset_in_seq"] == cum % PACK_BUDGET, (src, r)
            cum += r["n_tokens"]
