"""Scale rehearsal: measure candidate-generation balance as the corpus grows.

Turns the "bucketed, never all-pairs" design claim for L2 (near-dup
dedup) and L3 (ANN similarity) into a measured curve: inflate the
documents/embeddings fixtures Nx (token-salted replicas — each replica's
shingles are distinct, so this models a BIGGER corpus, not a
pathological duplicate explosion) and record, at each scale:

- posting-list / band-bucket size distribution (the per-task pair-emit
  bound), and
- the per-partition row histogram at the bucket shuffle (the reducer
  balance AQE actually schedules), plus
- candidate-pair volume and wall time.

If the max-partition share stays flat while N grows, the shuffle is
balanced and the design scales; a rising share would flag a skew
bottleneck long before 100 TB. Results are appended to BENCH_NOTES.md.

Usage: python tools/scale_rehearsal.py [sf_dir] [factors...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from hyperswitch_data_backfill_spark.catalog import load_table  # noqa: E402
from hyperswitch_data_backfill_spark.operators import dedup  # noqa: E402
from hyperswitch_data_backfill_spark.operators.similarity import (  # noqa: E402
    IVF_K,
    ivf_cells_udf,
)
from hyperswitch_data_backfill_spark.session import get_spark  # noqa: E402


def inflate_docs(docs: DataFrame, n: int) -> DataFrame:
    """n token-salted replicas: every token carries the replica id, so
    replicas share no shingles — a corpus n× BIGGER, not n× duplicated."""
    if n == 1:
        return docs
    r = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    )
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
        ),
        " ",
    )
    return r.select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def part_hist(df: DataFrame) -> tuple[int, int, float]:
    """(n_partitions, max_rows, max_share) of the frame as scheduled."""
    rows = (
        df.withColumn("pid", F.spark_partition_id()).groupBy("pid").count().collect()
    )
    counts = [r["count"] for r in rows] or [0]
    total = sum(counts) or 1
    return len(counts), max(counts), max(counts) / total


def bucket_stats(df: DataFrame, size_col) -> tuple[int, int, float]:
    """(n_buckets, max_members, p99_members) of a bucketed frame."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(size_col).alias("mx"),
        F.expr(f"percentile({size_col._jc.toString()}, 0.99)").alias("p99"),
    ).collect()[0]
    return row["n"], row["mx"], float(row["p99"] or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="scale-rehearsal")
    base = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    print("| N | docs | shingle buckets (max/p99 df) | jaccard bucket-shuffle "
          "max-part share | band buckets (max members) | band-shuffle "
          "max-part share | cand pairs | pair wall s | max IVF cell share |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n in factors:
        docs = inflate_docs(base, n).cache()
        n_docs = docs.count()

        sh = dedup.shingles_df(docs)
        postings = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        n_b, mx_df, p99_df = bucket_stats(postings, F.col("df"))
        _, _, share_j = part_hist(postings)

        sig = dedup.minhash_signatures(docs)
        bands = F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.xxhash64(
                        F.slice("sig", bi * dedup.LSH_ROWS + 1, dedup.LSH_ROWS)
                    ).alias("bh"),
                )
                for bi in range(dedup.LSH_BANDS)
            ]
        )
        banded = sig.select("doc_id", F.explode(bands).alias("b")).select(
            "doc_id", "b.band", "b.bh"
        )
        bbuckets = banded.groupBy("band", "bh").agg(
            F.count(F.lit(1)).alias("members")
        )
        multi = bbuckets.filter(F.col("members") > 1)
        _, mx_m, _ = bucket_stats(
            multi.unionByName(
                spark.createDataFrame([(0, 0, 1)], "band int, bh long, members long")
            ),
            F.col("members"),
        )
        _, _, share_b = part_hist(bbuckets)

        t0 = time.perf_counter()
        # pair volume through the production operator path (bucket-local
        # emit) on the inflated corpus via a temp view swap-in
        sh2 = sh.withColumn(
            "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        buckets = (
            sh2.groupBy("shingle")
            .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n_sh"))).alias("m"))
            .filter(F.size("m") > 1)
        )
        pair_count = buckets.select(
            F.sum(
                (F.size("m") * (F.size("m") - F.lit(1)) / F.lit(2)).cast("bigint")
            ).alias("p")
        ).collect()[0]["p"] or 0
        wall = time.perf_counter() - t0

        cells = emb.select(
            F.explode(ivf_cells_udf(F.col("embedding"), 1)).alias("cell")
        ).groupBy("cell").count()
        crow = cells.agg(
            F.max("count").alias("mx"), F.sum("count").alias("t")
        ).collect()[0]
        cell_share = crow["mx"] / crow["t"]

        print(
            f"| {n} | {n_docs} | {n_b} ({mx_df}/{p99_df:.0f}) | {share_j:.3f} "
            f"| {mx_m} | {share_b:.3f} | {pair_count} | {wall:.1f} "
            f"| {cell_share:.3f} (k={IVF_K}) |"
        )
        docs.unpersist()
    spark.stop()




def events_mode() -> None:
    """Second rehearsal axis: keyed-window operators as the EVENT LOG
    grows Nx (user-replicated — more users, same per-user history, the
    way a payments fleet actually grows). Records wall time, the
    window-shuffle partition balance, and the whale bound (max rows per
    user) for the carry-forward/window analytics family. Flat max-part
    share + flat per-user bound + ~linear wall = the claimed shape."""
    from hyperswitch_data_backfill_spark.operators.analytics import (
        last_touch_attribution,
        sessioned_funnel,
        time_weighted_avg,
    )

    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[3:]] or [1, 4, 16]
    spark = get_spark(app_name="scale-rehearsal-events")
    base = load_table(spark, sf_dir, "events")

    def inflate(ev: DataFrame, n: int) -> DataFrame:
        if n == 1:
            return ev
        r = ev.select("*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep"))
        return r.select(
            (F.col("event_id") + F.col("rep").cast("bigint") * F.lit(10**9)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep").cast("bigint") * F.lit(10**7)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    print("| N | events | users | max rows/user | twa wall s (max-part share) "
          "| attr wall s | sessioned-funnel wall s |")
    print("|---|---|---|---|---|---|---|")
    for n in factors:
        ev = inflate(base, n).localCheckpoint(eager=True)
        n_ev = ev.count()
        n_users = ev.select("user_id").distinct().count()
        whale = (
            ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
        )

        t0 = time.perf_counter()
        twa = time_weighted_avg(ev)
        twa.write.format("noop").mode("overwrite").save()
        twa_wall = time.perf_counter() - t0
        _, _, share = part_hist(twa)

        t0 = time.perf_counter()
        last_touch_attribution(ev).write.format("noop").mode("overwrite").save()
        attr_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        sessioned_funnel(ev).write.format("noop").mode("overwrite").save()
        funnel_wall = time.perf_counter() - t0

        print(
            f"| {n} | {n_ev} | {n_users} | {whale} "
            f"| {twa_wall:.1f} ({share:.3f}) | {attr_wall:.1f} "
            f"| {funnel_wall:.1f} |"
        )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--events":
        events_mode()
    else:
        main()
