"""Property tests for the round-4 operator additions, beyond the
auto-parametrized oracle parity in test_oracle_parity.py:

- cdc_snapshot_diff: the changelog is SUFFICIENT — applying it to the
  old snapshot must reconstruct the new snapshot exactly (the property
  a CDC consumer depends on, stronger than row-set equality with an
  oracle that shares the diff's own logic).
- agg_incremental_merge: the merge is split-invariant — partials built
  from a 3-way batch split merge to the same rollup as the registered
  2-way split (associativity/commutativity of the partial algebra).
- agg_heavy_hitters: output is exactly the over-threshold slice of the
  full frequency table (no false positives, none missing).
- dedup_span_ngrams: every reported gram really occurs as a contiguous
  token span in >= ndocs distinct documents.
- win_ntile: quartiles within each partition are balanced to +/-1 and
  ordered by the sort key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.registry import REGISTRY, queries
from hyperswitch_data_backfill_spark.catalog import load_table
from tests.conftest import SF_DIR

queries()  # force registration


def test_cdc_diff_replays_old_to_new(spark):
    diff = REGISTRY["cdc_snapshot_diff"].fn(spark, SF_DIR)
    orders = load_table(spark, SF_DIR, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    deletes = diff.filter(F.col("op") == "delete").select("o_orderkey")
    upserts = diff.filter(F.col("op") != "delete").select(
        "o_orderkey",
        F.col("new_status").alias("o_orderstatus"),
        F.col("new_price").alias("o_totalprice"),
    )
    replayed = (
        old.join(diff.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(upserts)
        .join(deletes, "o_orderkey", "left_anti")
    )
    assert replayed.exceptAll(new).count() == 0
    assert new.exceptAll(replayed).count() == 0


def test_incremental_merge_is_split_invariant(spark):
    registered = REGISTRY["agg_incremental_merge"].fn(spark, SF_DIR)
    orders = load_table(spark, SF_DIR, "orders")
    month = F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
    partials3 = (
        orders.withColumn("batch", (F.col("o_orderkey") % 3).cast("int"))
        .groupBy(month, F.col("batch"))
        .agg(
            F.count(F.lit(1)).alias("p_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("p_sum"),
            F.min("o_totalprice").alias("p_min"),
            F.max("o_totalprice").alias("p_max"),
        )
    )
    merged3 = (
        partials3.groupBy("month")
        .agg(
            F.sum("p_cnt").alias("cnt"),
            F.sum("p_sum").cast("double").alias("total"),
            F.min("p_min").alias("min_price"),
            F.max("p_max").alias("max_price"),
        )
        .select(
            "month", "cnt", "total", "min_price", "max_price",
            (F.col("total") / F.col("cnt")).alias("avg_price"),
        )
    )
    assert registered.exceptAll(merged3).count() == 0
    assert merged3.exceptAll(registered).count() == 0


def test_heavy_hitters_exact_slice(spark):
    hh = {r.l_partkey: r.cnt for r in REGISTRY["agg_heavy_hitters"].fn(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    freq = {
        r.l_partkey: r.cnt
        for r in li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    mean = sum(freq.values()) / len(freq)
    expected = {k: v for k, v in freq.items() if v > 1.5 * mean}
    assert hh == expected


def test_span_ngrams_occur_in_reported_doc_counts(spark):
    spans = REGISTRY["dedup_span_ngrams"].fn(spark, SF_DIR)
    sample = spans.orderBy(F.desc("occurrences"), "gram").limit(20).collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert sample, "fixture corpus should contain duplicated 3-gram spans"
    for row in sample:
        n = docs.filter(
            F.col("text").contains(row.gram)  # superset check: substring match
        ).count()
        assert n >= row.ndocs, (row.gram, n, row.ndocs)
        assert row.occurrences >= row.ndocs >= 2


def test_ntile_quartiles_balanced_and_ordered(spark):
    df = REGISTRY["win_ntile"].fn(spark, SF_DIR)
    sizes = (
        df.groupBy("o_orderstatus", "quartile").count().collect()
    )
    by_status: dict[str, list[int]] = {}
    for r in sizes:
        by_status.setdefault(r.o_orderstatus, []).append(r["count"])
    for status, counts in by_status.items():
        assert len(counts) == 4, status
        assert max(counts) - min(counts) <= 1, (status, counts)
    # pct_rank within a partition must be non-decreasing in quartile
    agg = (
        df.groupBy("o_orderstatus", "quartile")
        .agg(F.min("pct_rank").alias("lo"), F.max("pct_rank").alias("hi"))
        .orderBy("o_orderstatus", "quartile")
        .collect()
    )
    prev: dict[str, float] = {}
    for r in agg:
        if r.o_orderstatus in prev:
            assert r.lo >= prev[r.o_orderstatus]
        prev[r.o_orderstatus] = r.hi


def test_pagerank_mass_and_determinism(spark):
    from hyperswitch_data_backfill_spark.operators.graph import PR_BASE, PR_OFFSET

    pr = REGISTRY["graph_pagerank"].fn(spark, SF_DIR)
    rows = pr.collect()
    n = len(rows)
    total = sum(r.pr for r in rows)
    # fixed-point truncation only LOSES mass: total <= initial mass,
    # but the damping floor keeps every node at >= 15% of base
    assert total <= n * PR_BASE
    assert all(r.pr >= PR_BASE * 15 // 100 for r in rows)
    # bipartite id spaces must not collide
    custs = [r for r in rows if r.node < PR_OFFSET]
    parts = [r for r in rows if r.node >= PR_OFFSET]
    assert custs and parts
    # determinism: a second build is bit-identical (integer arithmetic)
    again = {r.node: r.pr for r in REGISTRY["graph_pagerank"].fn(spark, SF_DIR).collect()}
    assert {r.node: r.pr for r in rows} == again


def test_countmin_never_underestimates(spark):
    est = {r.l_partkey: r.est for r in REGISTRY["agg_countmin"].fn(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    true = {
        r.l_partkey: r.cnt
        for r in li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true), "count-min must never underestimate"
    # overestimate bounded: mean relative error small at this load factor
    rel = sum((est[k] - true[k]) / true[k] for k in true) / len(true)
    assert rel < 2.0, rel


def test_pq_quantize_quality(spark):
    import numpy as np
    from hyperswitch_data_backfill_spark.operators.similarity import (
        PQ_K, PQ_M, emb_pq_quantize_arrays,
    )

    out = emb_pq_quantize_arrays(spark, SF_DIR).collect()
    assert out
    for r in out[:50]:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_K for c in r.codes)
        assert r.recon_mse >= 0
    # PQ (per-subspace codebook) must beat the best single global
    # centroid: recon MSE < MSE of quantizing everything to the mean
    emb = load_table(spark, SF_DIR, "embeddings")
    vecs = np.stack([np.array(r.embedding) for r in emb.collect()])
    mean_vec = vecs.mean(axis=0)
    mse_rank0 = float(((vecs - mean_vec) ** 2).mean())
    mean_pq = sum(r.recon_mse for r in out) / len(out)
    assert mean_pq < mse_rank0, (mean_pq, mse_rank0)
    # encode is deterministic / idempotent
    again = {r.vec_id: tuple(r.codes) for r in emb_pq_quantize_arrays(spark, SF_DIR).collect()}
    assert {r.vec_id: tuple(r.codes) for r in out} == again


def test_pq_quantize_driver_key_packs_codes_losslessly(spark):
    """The registered key emits one BIGINT per vector (driver-hashable —
    the r4 canonicalizer crashed on array cells); the fold acc*16+c must
    decode back to exactly the array variant's codes."""
    from hyperswitch_data_backfill_spark.operators.similarity import (
        PQ_K, PQ_M, emb_pq_quantize_arrays,
    )

    packed = {
        r.vec_id: r.codes_packed
        for r in REGISTRY["emb_pq_quantize"].fn(spark, SF_DIR).collect()
    }
    arrays = {
        r.vec_id: list(r.codes) for r in emb_pq_quantize_arrays(spark, SF_DIR).collect()
    }
    assert set(packed) == set(arrays)
    for vid, p in packed.items():
        decoded = []
        for _ in range(PQ_M):
            decoded.append(int(p % PQ_K))
            p //= PQ_K
        assert decoded[::-1] == arrays[vid], vid
    # schema is canonicalizer-safe: no array/struct columns
    df = REGISTRY["emb_pq_quantize"].fn(spark, SF_DIR)
    assert all(not t.startswith(("array", "struct")) for _, t in df.dtypes), df.dtypes
