"""Z-order (Morton) layout — multi-dimensional data-skipping for lakes.

At 100 TB the dominant read cost is touching row groups a query doesn't
need. Min/max pruning only helps along the physical sort order; a table
sorted by date skips nothing for a customer-range predicate. Z-ordering
interleaves the bits of several clustering keys into one Morton code so
that RANGE-PARTITIONING BY Z-VALUE gives every file a tight bounding box
in ALL clustered dimensions — a 2-D box predicate then touches O(√files)
instead of O(files) (measured, not argued: see
tests/test_quality_guards.py::test_zorder_touches_fewer_buckets).

Production write path::

    df.withColumn("z", zvalue(F.col("a"), F.col("b")))
      .repartitionByRange(n_files, "z")
      .sortWithinPartitions("z")
      .write.parquet(...)

— one range shuffle, then parquet min/max stats do the pruning for free
on read. The fixture query emits the z-value + coarse z-bucket per row
(pure map-only integer arithmetic, no shuffle) so the DuckDB oracle can
replay the interleave bit-for-bit.

Reference parity note: the reference (919 LoC Rust) has no storage
layout management at all; this is north-star lake-maintenance surface
alongside compaction (operators/compaction.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register

Z_BITS = 16  # bits per dimension → 32-bit Morton code for 2-D


def zvalue(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """2-D Morton code: interleave ``bits`` low bits of a and b.

    Pure integer arithmetic (floor-div/mod by powers of two) rather than
    shift builtins, so the IDENTICAL expression runs on any engine — the
    oracle replays it in DuckDB. Codegen folds the constants; the whole
    thing is one projection, no shuffle, no UDF.
    """
    terms = []
    for i in range(bits):
        bit_a = (a / F.lit(1 << i)).cast("bigint") % 2  # floor-div: inputs are non-negative
        bit_b = (b / F.lit(1 << i)).cast("bigint") % 2
        terms.append(bit_a * F.lit(1 << (2 * i + 1)) + bit_b * F.lit(1 << (2 * i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _z_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The same interleave as ``zvalue``, as engine-neutral SQL text."""
    terms = [
        f"((CAST(FLOOR(({a}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        f" + (CAST(FLOOR(({b}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)})"
        for i in range(bits)
    ]
    return " + ".join(terms)


_EPOCH = "1992-01-01"
N_Z_BUCKETS_BITS = 8  # coarse bucket = top 8 Morton bits → 256 buckets


@register(
    "layout_zorder",
    oracle=f"""
    WITH raw AS (
        -- BIGINT up front: (ra - min) * 2^16 overflows INT32 once the
        -- custkey span exceeds ~32k (sf >= 0.2) — widen before the
        -- multiply in BOTH engines so the arithmetic is identical
        SELECT o_orderkey,
               CAST(o_custkey AS BIGINT) AS ra,
               CAST(datediff('day', DATE '{_EPOCH}', o_orderdate) AS BIGINT) AS rb
        FROM orders
    ), d AS (
        -- normalize each dimension onto the full {Z_BITS}-bit range via
        -- its (min, max) span (exact integer //): without this the high
        -- Morton bits of a narrow/offset dimension are constant and
        -- locality degenerates
        SELECT o_orderkey,
               ((ra - (SELECT MIN(ra) FROM raw)) * {1 << Z_BITS})
                   // ((SELECT MAX(ra) - MIN(ra) FROM raw) + 1) AS a,
               ((rb - (SELECT MIN(rb) FROM raw)) * {1 << Z_BITS})
                   // ((SELECT MAX(rb) - MIN(rb) FROM raw) + 1) AS b
        FROM raw
    )
    SELECT o_orderkey, a AS custkey_dim, b AS date_dim,
           CAST({_z_sql('a', 'b')} AS BIGINT) AS zval,
           CAST(({_z_sql('a', 'b')}) // {1 << (2 * Z_BITS - N_Z_BUCKETS_BITS)}
                AS BIGINT) AS z_bucket
    FROM d
    """,
    doc="Lake layout: per-row 2-D Z-order (Morton) code over "
        "(customer, order-date) plus the coarse z-bucket (top 8 bits = "
        "the range-partition a writer would assign). Each dimension is "
        "first normalized onto the full 16-bit range via its max — a "
        "1-row broadcast aggregate (scalar subquery in the oracle), the "
        "only non-map step; the interleave itself fuses into the scan. "
        "Production write adds one repartitionByRange on zval. The "
        "locality payoff is measured in pytest: a 2-D box predicate "
        "touches ~4x fewer z-buckets than date-linear buckets at equal "
        "bucket count.",
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # bigint BEFORE the normalize multiply: (ra - min) * 2^16 overflows
    # INT32 once the key span exceeds ~32k (oracle widened identically)
    raw = orders.select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("ra"),
        F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("date"))
        .cast("bigint")
        .alias("rb"),
    )
    bounds = raw.agg(
        F.min("ra").alias("ra_min"),
        F.max("ra").alias("ra_max"),
        F.min("rb").alias("rb_min"),
        F.max("rb").alias("rb_max"),
    )
    d = raw.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        F.expr(f"((ra - ra_min) * {1 << Z_BITS}) div (ra_max - ra_min + 1)").alias("a"),
        F.expr(f"((rb - rb_min) * {1 << Z_BITS}) div (rb_max - rb_min + 1)").alias("b"),
    )
    z = zvalue(F.col("a"), F.col("b"))
    return d.select(
        "o_orderkey",
        F.col("a").alias("custkey_dim"),
        F.col("b").alias("date_dim"),
        z.cast("bigint").alias("zval"),
    ).withColumn(
        "z_bucket",
        F.expr(f"zval div {1 << (2 * Z_BITS - N_Z_BUCKETS_BITS)}"),
    )
