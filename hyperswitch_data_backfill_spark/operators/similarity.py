"""Similarity search over embeddings — SURVEY §2.11 L3 (north-star).

Three operators over ``embeddings(vec_id, embedding array<float>, label)``:

- ``sim_exact_small`` — brute-force cosine top-k for a small query set:
  the *correctness baseline*. Broadcast the queries (small side), scan
  the corpus once; per-partition top-k via window rank. Cost is
  O(|Q|·N·d) FLOPs with zero shuffle of the corpus — fine whenever |Q|
  is small, at any corpus size.
- ``sim_topk`` — the scale path: random-hyperplane LSH (16-bit
  signatures). Corpus and queries hash to buckets; candidates are
  bucket-colocated only, so the join is bucket-equi, never cross.
  Approximate → rows-only check.
- ``neardup_cosine`` — embedding near-duplicate pairs above a cosine
  threshold with label blocking (the realistic pipeline blocks on a
  cheap key — cluster/lang/shard — before pairing).

All vector math is codegen'd higher-order functions (functions/arrays.py)
— double-widened, sequential fold, rounded to 6dp at comparison points.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.functions.arrays import cosine, dot
from hyperswitch_data_backfill_spark.registry import register

N_QUERIES = 8
TOP_K = 10
NEARDUP_COS = 0.95
LSH_BITS = 16
DIM = 64


@register(
    "sim_exact_small",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT q.q_id, e.vec_id,
               ROUND(
                   list_sum(list_transform(list_zip(q.q_emb, e.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               6) AS cos_sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cos_sim, rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rk
        FROM scored
    ) t WHERE rk <= {TOP_K}
    """,
    doc="L3a: exact cosine top-k for a small query set — broadcast queries, "
        "one corpus scan, per-query rank. The oracle for the ANN variants.",
)
def sim_exact_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


def _hyperplanes(seed: int = 0, bits: int = LSH_BITS, dim: int = DIM) -> list[list[float]]:
    """Deterministic random hyperplanes, shipped as literals (tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_signature(col, planes: list[list[float]]):
    """16-bit random-hyperplane signature of an array<float> column."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bits.append(F.when(dot(col, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


@register(
    "sim_topk",
    oracle=None,  # approximate (LSH recall < 1) → rows-only
    doc="L3b: ANN top-k via random-hyperplane LSH — signature bucketing, "
        "bucket-equi join, per-query rank. The 100 TB path: candidates are "
        "bucket-colocated (repartition by signature), never a cross join.",
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    sig = emb.withColumn("bucket", lsh_signature(F.col("embedding"), planes))
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), F.col("bucket")
    )
    cand = (
        sig.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


@register(
    "neardup_cosine",
    oracle=f"""
    SELECT id_a, id_b, label, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
               ROUND(
                   list_sum(list_transform(list_zip(a.embedding, b.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               6) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    ) t WHERE cos_sim >= {NEARDUP_COS}
    """,
    doc="L3c: embedding-cosine near-dup pairs with label blocking — the "
        "blocked pair join (label-equi, so partitions pair only within a "
        "block); at 100 TB the block key is an LSH bucket instead of label.",
)
def neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    cs = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").alias("label"),
            F.round(cs, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEARDUP_COS)
    )
