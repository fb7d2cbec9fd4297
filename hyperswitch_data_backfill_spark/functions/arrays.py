"""Array/vector expressions — SURVEY §2.8 X7.

Foundation for the similarity operators (operators/similarity.py): all
vector math is expressed with codegen'd higher-order functions
(``transform``/``aggregate``/``zip_with``) over ``array<float>`` —
JVM-side, no Python, no UDF. Float32 elements are widened to double
*before* any arithmetic; results that fold many elements are rounded to
6 decimals wherever an oracle comparison happens (fold order is
engine-specific at the last ulp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@register(
    "array_ops",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           CAST(embedding[1] AS DOUBLE) AS head
    FROM embeddings
    """,
    doc="X7: per-vector dimension, L2 norm (double fold, rounded 6dp), head "
        "element — exercises transform/aggregate over array<float>.",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.round(norm(F.col("embedding")), 6).alias("l2_norm"),
        F.element_at("embedding", 1).cast("double").alias("head"),
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH s AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS sv
        FROM embeddings
    ), n AS (
        SELECT vec_id, sv,
               sqrt(CAST(list_sum(list_transform(sv, x -> x * x)) AS DOUBLE)) AS nrm
        FROM s
    )
    SELECT vec_id,
           ROUND(nrm / 1000000.0, 6) AS l2_norm,
           array_to_string(list_transform(sv,
               x -> CAST(round((CAST(x AS DOUBLE) * 127.0) / nrm) AS TINYINT)),
               ',') AS q8
    FROM n WHERE nrm > 0
    """,
    doc="L2-normalize + symmetric int8 quantization of the embedding "
        "column — the standard 4x storage/bandwidth shrink before ANN "
        "indexing. Engine-exact despite the float pipeline: elements are "
        "first scaled to 1e-6-resolution BIGINTs (exact in both engines), "
        "the squared-sum folds integers, and every double op after that "
        "has bit-identical operands on both sides. Pure codegen "
        "transform/aggregate — per-row, no shuffle, no UDF.",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("bigint"),
    )
    df = emb.select("vec_id", scaled.alias("sv"))
    ssq = F.aggregate(
        F.col("sv"), F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    )
    df = df.withColumn("nrm", F.sqrt(ssq.cast("double"))).filter(F.col("nrm") > 0)
    q8 = F.transform(
        F.col("sv"),
        lambda x: F.round((x.cast("double") * F.lit(127.0)) / F.col("nrm")).cast("tinyint"),
    )
    # The vector is emitted as a comma-joined string, not array<tinyint>:
    # the external correctness driver canonicalizes result rows through
    # pandas sorting, which cannot hash array cells (the exact failure
    # agg_approx_percentile hit in round 1). A delimited string carries
    # the identical information and sorts/compares as a scalar.
    return df.select(
        "vec_id",
        F.round(F.col("nrm") / F.lit(1000000.0), 6).alias("l2_norm"),
        F.array_join(q8.cast("array<string>"), ",").alias("q8"),
    )


_RP_OUT_DIMS = 16
_RP_A = 2654435761  # Knuth multiplicative hash constant
_RP_B = 40503


@register(
    "emb_random_projection",
    oracle="""
    WITH s AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS sv
        FROM embeddings
    )
    SELECT vec_id,
    """
    + ",\n    ".join(
        # CAST: DuckDB list_sum over BIGINTs returns HUGEINT -> pandas
        # float64, hash-mismatching Spark's int64 on identical values.
        f"""CAST(list_sum(list_transform(range(0, len(sv)), i ->
               sv[i + 1] * ((i * {_RP_A} + {j} * {_RP_B}) % 2001 - 1000))) AS BIGINT) AS p{j}"""
        for j in range(_RP_OUT_DIMS)
    )
    + "\n    FROM s",
    doc="Embedding dimensionality reduction via seeded random projection "
        "(Johnson-Lindenstrauss style): a 16 x dim matrix whose entries "
        "derive from a multiplicative hash of (row, col) — no stored "
        "model, both engines regenerate it from arithmetic. Elements are "
        "first scaled to 1e-6-resolution BIGINTs, so every dot product "
        "is exact integer math (engine-identical); pure codegen "
        "transform/aggregate per row, no shuffle, no UDF. The 100 TB "
        "shape: map-only, fuses with the scan; downstream ANN indexes "
        "the 16-dim output at 4x less compute per distance.",
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("bigint"),
    )
    df = emb.select("vec_id", scaled.alias("sv"))
    projections = [
        F.expr(
            f"""aggregate(
                   zip_with(sv, sequence(0, size(sv) - 1),
                            (x, i) -> x * ((i * {_RP_A}L + {j * _RP_B}L) % 2001 - 1000)),
                   0L, (acc, v) -> acc + v)"""
        ).alias(f"p{j}")
        for j in range(_RP_OUT_DIMS)
    ]
    return df.select("vec_id", *projections)
