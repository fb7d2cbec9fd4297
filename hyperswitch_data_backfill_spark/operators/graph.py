"""Graph analytics over relational edge lists — SURVEY §2.11 extension.

The reference has no graph surface; connected components already exist
for dedup clustering (operators/dedup.py `propagate_min_labels`). This
module adds the other canonical iterative-graph primitive, PageRank,
expressed as a fixed number of unrolled DataFrame join+aggregate
rounds — the Pregel pattern without a graph framework.

Determinism contract: ranks are kept in integer micro-units (bigint)
and every per-edge contribution is `floor(rank / degree)` — pure
integer-in, integer-out arithmetic whose intermediate double divisions
are exact (all operands < 2^53), so Spark and DuckDB produce
bit-identical ranks and the operator is fully oracle-hashable despite
being iterative. The truncation loses ≤ degree micro-units per node
per round (bounded, deterministic) — the standard fixed-point PageRank
formulation used when cross-platform reproducibility matters.

Scale shape (100 TB): the edge list with degrees is materialized ONCE
(localCheckpoint — the in-session stand-in for landing the adjacency
table), hash-partitioned AND sorted on src so the checkpoint records
the layout (r17; see api.pagerank); every round's edges⋈ranks join
then streams the edge side with no exchange and no sort, and the only
per-round shuffle is the genuine src→dst contribution regroup.
Rounds are a fixed small constant (power iteration converges
geometrically at damping 0.85); memory per round is O(nodes), never
O(edges), on the rank side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register

PR_ITER = 3
PR_BASE = 1_000_000  # initial rank in micro-units
PR_OFFSET = 1_000_000_000  # part-node id offset to disjoin key spaces


def _pagerank_oracle(iters: int = PR_ITER) -> str:
    """Chained-CTE DuckDB replay of the exact integer arithmetic."""
    sql = f"""
    WITH e AS (
        SELECT DISTINCT o.o_custkey AS src,
               {PR_OFFSET} + l.l_partkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), bidir AS (
        SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
    ), deg AS (
        SELECT src AS node, COUNT(*) AS deg FROM bidir GROUP BY src
    ), r0 AS (
        SELECT node, CAST({PR_BASE} AS BIGINT) AS pr FROM deg
    )"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
    c{i} AS (
        SELECT b.dst AS node,
               SUM(CAST(FLOOR(r.pr / d.deg) AS BIGINT)) AS contrib
        FROM bidir b
        JOIN {prev} r ON b.src = r.node
        JOIN deg d ON b.src = d.node
        GROUP BY b.dst
    ),
    r{i} AS (
        SELECT d.node,
               CAST({PR_BASE} * 15 / 100 AS BIGINT)
               + CAST(FLOOR(COALESCE(c.contrib, 0) * 85 / 100.0) AS BIGINT) AS pr
        FROM deg d LEFT JOIN c{i} c ON d.node = c.node
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT node, pr FROM {prev}
    """
    return sql


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc=f"G1: fixed-point PageRank ({PR_ITER} unrolled power-iteration "
        "rounds, damping 0.85) over the bipartite customer↔part "
        "co-purchase graph derived from orders⋈lineitem, made "
        "undirected by mirroring edges. Integer micro-unit ranks with "
        "floor'd contributions make an ITERATIVE graph algorithm fully "
        "oracle-hashable — the oracle replays the identical arithmetic "
        "through chained CTEs. Adjacency+degree materialized once "
        "(checkpoint), each round = one join + one agg, both keyed on "
        "node id.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Delegates to the generic kernel (api.pagerank) since r17 — the
    # two implementations were line-for-line duplicates pinned equal by
    # test_pagerank_equiv_to_registered_key, and the r17 exchange-reuse
    # reshape (adjacency checkpointed hash-partitioned + sorted on src,
    # one exchange per round instead of ~3; see api.pagerank docstring)
    # belongs in exactly one place. Same arithmetic, oracle-hash-green.
    from hyperswitch_data_backfill_spark import api

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(PR_OFFSET) + F.col("l_partkey")).alias("dst"),
        )
        .distinct()
    )
    return api.pagerank(
        e, iters=PR_ITER, damping_pct=85, base=PR_BASE, undirected=True
    )


# Fixture subgraph bound: the synthetic co-supply graph densifies to a
# COMPLETE graph as sf grows (every part eventually touches every
# supplier), which makes unbounded triangle counting O(n^3) fixture
# noise, not algorithm signal. The fixture key therefore counts over a
# fixed supplier cohort (suppkey <= 100 — ALL suppliers at sf <= 0.01,
# an sf-invariant subgraph above), pushed into both scans; the
# algorithm itself is the scalable ordered-wedge form and the docstring
# documents degree-orientation for real (sparse, skewed) graphs.
TRI_COHORT_MAX = 100


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        WHERE l_suppkey <= {TRI_COHORT_MAX}
    ), e AS (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
    ), tri AS (
        SELECT e1.u, e1.v, e2.v AS w
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM tri
    """,
    doc="Exact triangle counting over the supplier co-supply graph "
        "(suppliers sharing a part) — the clustering-coefficient / "
        "community-density primitive, and the second canonical "
        "distributed-graph op after PageRank. Uses the ordered-edge "
        "orientation (u<v<w): every edge stored low→high, wedges built "
        "by joining edge lists on the middle vertex, closed by a third "
        "hash join — the Cohen MapReduce formulation whose wedge count "
        "is Σ deg_out·deg_in, minimized at scale by orienting edges "
        "from low- to high-DEGREE endpoints (documented alternative; "
        "id-orientation keeps the oracle exact here). Projection first "
        "DEDUPES (part,supplier) pairs map-side, so the pair-join fan-"
        "out is bounded by per-part supplier counts (the J6 skew-cap "
        "pattern would clamp a pathological part).",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.filter(F.col("l_suppkey") <= TRI_COHORT_MAX)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = ps.alias("a")
    b = ps.alias("b")
    # the edge list feeds three join legs — materialize it ONCE
    # (localCheckpoint = the in-session stand-in for landing the edge
    # table; without it Catalyst re-runs the pair-join per leg)
    e = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
    )
    edges_ct = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    tri_ct = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    return edges_ct.crossJoin(tri_ct)
