"""Quickstart: the headline pipelines, end to end.

Run: python examples/quickstart.py [sf_dir]   (default sf0.001, ~1 min)

1. Payments backfill — the reference's job: scan orders in a window,
   project Kafka event records (key/value/topic).
2. LLM corpus build — gate → dedup → near-dup drop → decontam → pack.
3. Settlement report — as-of FX conversion → daily rollup → deltas.
4. Vector search — IVF-PQ approximate nearest neighbors.
5. Multimodal ingestion — files on disk → binaryFile source → real
   PNG decode in mapInPandas (round 5).
6. Encrypted config boot — enc:<hex> secrets decrypted at load with a
   master key (round 5, ≙ the reference's KMS resolution).
7. The generic library API — the same kernels on caller tables/columns.
8. Kafka wire loop — produce + fetch back over real TCP, both dialects
   (round 13).
9. Perceptual media dedup — image dHash near-dup pairs (round 13).

Every pipeline stop is also a registered fixture query verified against
a DuckDB oracle (see INVENTORY.md); this script is the human-facing
tour of the same entry points.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from hyperswitch_data_backfill_spark.registry import REGISTRY, queries
from hyperswitch_data_backfill_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")
    queries()

    print("\n=== 1. Kafka event projection (the reference's backfill) ===")
    REGISTRY["kafka_payload_shape"].fn(spark, sf_dir).show(3, truncate=60)

    print("=== 2. LLM corpus build (gate→dedup→decontam→pack) ===")
    REGISTRY["pipeline_corpus_build"].fn(spark, sf_dir).show(5)

    print("=== 3. Daily settlement report (as-of FX + deltas) ===")
    REGISTRY["pipeline_settlement_report"].fn(spark, sf_dir).orderBy(
        "ccy", "day"
    ).show(5)

    print("=== 4. IVF-PQ vector search (top-k per query) ===")
    REGISTRY["sim_ivfpq"].fn(spark, sf_dir).orderBy("q_id", "rk").show(5)

    print("=== 5. Multimodal ingestion (binaryFile -> PNG codec) ===")
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from hyperswitch_data_backfill_spark.operators import codecs
    from hyperswitch_data_backfill_spark.operators.multimodal import (
        extract_features,
    )
    from hyperswitch_data_backfill_spark.sources.files import read_binary_files

    media_dir = tempfile.mkdtemp(prefix="quickstart_media_")
    img = (np.arange(96).reshape(8, 12) % 256).astype(np.uint8)
    with open(f"{media_dir}/sample.png", "wb") as f:
        f.write(codecs.encode_png(img))
    media = read_binary_files(spark, media_dir, glob="*.png").select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit("png").alias("kind"),
        F.col("content").alias("payload"),
    )
    extract_features(media, decode_stub=False).show(truncate=60)

    print("=== 6. Encrypted config boot (enc:<hex> secrets) ===")
    from hyperswitch_data_backfill_spark.config import (
        encrypt_secret_value,
        encrypted_value_resolver,
        load_config,
    )

    master = bytes.fromhex("9f" * 32)
    enc = encrypt_secret_value("replica-password", master)
    cfg_path = f"{media_dir}/config.toml"
    with open(cfg_path, "w") as f:
        f.write(
            f'[replica_database]\npassword = "{enc}"\n'
            '\n[events.kafka]\nbrokers = ["broker:9092"]\n'
            'consolidated_events_topic = "consolidated"\n'
        )
    cfg = load_config(cfg_path, resolver=encrypted_value_resolver(master))
    print(f"stored : {enc[:40]}...")
    print(f"loaded : {cfg.replica_database.password}")
    print(f"redact : {cfg.redact()['replica_database']['password']}")

    print("=== 7. The generic library API (your tables, your columns) ===")
    # Everything above also composes on caller-supplied DataFrames via
    # hyperswitch_data_backfill_spark.api — same kernels, any schema.
    from hyperswitch_data_backfill_spark import api
    from hyperswitch_data_backfill_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    # near-dup pairs -> connected components -> survivor per cluster
    pairs = api.neardup_pairs(docs, method="minhash")
    clusters = api.cluster_pairs(pairs)
    survivors = api.first_row_per_group(
        docs.join(
            clusters.withColumnRenamed("node", "doc_id"), "doc_id", "left"
        ).withColumn("label", F.coalesce("label", "doc_id")),
        "label",
        [F.col("doc_id")],
    )
    print(
        f"minhash pairs={pairs.count()}  "
        f"clustered_docs={clusters.count()}  survivors={survivors.count()}"
    )
    # contamination-proof splits on the deduped corpus
    api.stable_split(
        survivors, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).groupBy("split").count().orderBy("split").show()
    # as-of join: attach each user's latest purchase to every event
    ev = load_table(spark, sf_dir, "events")
    api.asof_join(
        ev.select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
        ),
        on="ts", by="user_id", value_cols=["purchase_value"],
        tiebreak="event_id",
    ).show(3)

    print("=== 8. Kafka wire loop: produce -> fetch back over real TCP ===")
    # Both dialects through the from-spec wire layer and the kafkawire
    # Spark source (round 13) — with the connector jar this is
    # format('kafka') on both ends.
    from hyperswitch_data_backfill_spark.sinks.kafka_wire import (
        WireBroker,
        write_kafka_wire,
    )
    from hyperswitch_data_backfill_spark.sources.kafka_fetch import (
        read_kafka_wire,
    )

    events = REGISTRY["kafka_payload_shape"].fn(spark, sf_dir).limit(200)
    with WireBroker() as broker:
        write_kafka_wire(events.repartition(2), "127.0.0.1", broker.port)
        fetched = read_kafka_wire(
            spark, "127.0.0.1", broker.port, "orders-events", version=4
        )
        fetched.selectExpr(
            "cast(key as string) key", "partition", "offset"
        ).show(3, truncate=40)

        # ... and the same topic as a LIVE stream: per-partition long
        # offsets, broker-durable groupId cursor, and maxRecordsPerBatch
        # admission so a resumed backlog drains in bounded micro-batches.
        import time

        from hyperswitch_data_backfill_spark.streaming.pipeline import (
            read_kafka_wire_stream,
        )

        stream = read_kafka_wire_stream(
            spark, "127.0.0.1", broker.port, "orders-events",
            group_id="quickstart", max_records_per_batch=64,
        )
        sq = (stream.selectExpr("cast(key as string) key", "offset")
              .writeStream.format("memory").queryName("qs_stream")
              .trigger(processingTime="250 milliseconds").start())
        deadline = time.time() + 60
        while spark.table("qs_stream").count() < 200 and time.time() < deadline:
            time.sleep(0.25)
        sq.stop()
        print(f"streamed {spark.table('qs_stream').count()} records "
              f"in micro-batches of <=64")

    print("=== 9. Perceptual media dedup (image dHash near-dups) ===")
    from hyperswitch_data_backfill_spark.operators.multimodal import doc_media

    api.neardup_images(doc_media(spark, sf_dir)).show(5)

    print("=== 10. Real PostgreSQL over the wire (backfill + live tail) ===")
    from hyperswitch_data_backfill_spark.sources.pgwire import (
        PgServer,
        PgServerUnavailable,
        read_pgwire,
        write_pgwire,
    )

    try:
        with PgServer() as pg:
            with pg.connect() as conn:
                conn.execute(
                    "CREATE TABLE qs_orders (o_orderkey bigint,"
                    " o_custkey bigint, o_totalprice float8)")
            carve = (spark.read.parquet(f"{sf_dir}/orders.parquet")
                     .where("o_orderkey % 100 = 1")
                     .select("o_orderkey", "o_custkey", "o_totalprice"))
            write_pgwire(carve.repartition(2), pg.host, pg.port,
                         "qs_orders", user=pg.user)
            back = read_pgwire(
                spark, pg.host, pg.port, "qs_orders", user=pg.user,
                partition_column="o_orderkey", num_partitions=4)
            with pg.connect() as conn:
                version = conn.parameters.get("server_version")
            print(f"round-tripped {back.count()} rows through a real "
                  f"PostgreSQL {version} server, 4 wire slices")
    except PgServerUnavailable as exc:
        print(f"(skipped: {exc})")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
