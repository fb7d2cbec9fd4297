"""File sources (CSV / JSON lines / parquet) with enforced schemas.

The reference reads only Postgres, but a backfill engine's input is
frequently a dump file: CSV/JSONL exports, parquet snapshots. These
builders mirror the engine's static-schema stance (SURVEY §1.3 — the
reference's Diesel schemas are compile-time fixed): **schemas are always
declared, never inferred**. Inference costs an extra full pass over the
data at 100 TB and silently changes types between runs; a declared
``StructType`` does neither.

Design: csv/json are scanned as TEXT and parsed with ``from_csv`` /
``from_json`` expressions rather than the format readers. Two reasons:

1. The quarantine contract. Spark's internal ``_corrupt_record`` column
   on raw csv/json scans cannot be queried alone
   (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — even
   ``clean.count()`` trips it after column pruning — and the documented
   workaround is caching the whole input, a non-starter at 100 TB.
   Expression-level parsing has no such restriction: the malformed line
   lands in a regular string column (same stance as the decrypt UDF's
   quarantine, functions/crypto.py), and clean/dead-letter frames are
   plain filters sharing one scan.
2. One scan, two consumers. Text scans split by line across files and
   blocks exactly like the csv reader's fast path; parsing happens in
   whole-stage codegen.

Trade-off (documented): no multi-line quoted-newline CSV records and no
header skipping — at-scale interchange files are headerless/escaped
exports or (better) parquet, where predicate pushdown also works.
Non-splittable codecs (gzip/bzip2) serialize the scan — prefer zstd/lz4.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


@dataclass(frozen=True)
class FileSourceConfig:
    """Declarative file-source spec (the dump-file twin of JdbcSourceConfig)."""

    path: str
    format: str  # csv | json | xml | parquet | orc | avro (needs spark-avro)
    schema: StructType | None = None  # required for csv/json/xml
    options: dict[str, str] = field(default_factory=dict)


def read_file_source(spark: SparkSession, cfg: FileSourceConfig) -> DataFrame:
    """Build the DataFrame for a file source; never infers a schema.

    csv/json rows carry the dead-letter column ``_corrupt_record``
    (NULL for clean rows, the raw line otherwise); blank lines are
    dropped. ``split_corrupt`` separates the two frames.
    """
    fmt = cfg.format.lower()
    if fmt == "parquet":
        return spark.read.options(**cfg.options).parquet(cfg.path)
    if fmt == "orc":
        # self-describing columnar like parquet: schema from the footer,
        # pushdown/pruning identical — the other lake format a backfill
        # may be handed (Hive-era dumps)
        return spark.read.options(**cfg.options).orc(cfg.path)
    if fmt == "avro":
        # external module since Spark 2.4 — honest capability error when
        # the spark-avro jar isn't deployed (same optional-dependency
        # pattern as codecs.py's PIL/soundfile dispatch)
        try:
            return spark.read.options(**cfg.options).format("avro").load(cfg.path)
        except Exception as e:
            # Only the data-source-not-found case means "jar missing" —
            # every other failure (bad path, corrupt files, schema error)
            # must surface unchanged or diagnostics lie about the cause.
            msg = str(e)
            if not any(
                marker in msg
                for marker in (
                    "Failed to find data source",
                    "FAILED_TO_LOAD_DATA_SOURCE",
                    "DATA_SOURCE_NOT_FOUND",
                )
            ):
                raise
            raise NotImplementedError(
                "avro source requires the spark-avro module on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<spark version>); "
                f"underlying error: {e}"
            ) from e
    if fmt == "xml":
        # built-in since Spark 4 — the payments-interchange format (ISO
        # 20022 pain/camt messages are XML). Records span lines, so the
        # text-scan+expression trick csv/json use does NOT apply here;
        # the format reader's own PERMISSIVE + columnNameOfCorruptRecord
        # provides the dead-letter column instead. One inherited
        # restriction (QUERY_ONLY_CORRUPT_RECORD_COLUMN): a query whose
        # pruned schema is ONLY the corrupt column is rejected by Spark
        # — quarantine consumers must keep at least one data column in
        # the projection (split_corrupt's full-row frames do; a bare
        # `bad.count()` does not — use `len(bad.collect())` or project a
        # data column first).
        if cfg.schema is None:
            raise ValueError("xml source requires an explicit schema (no inference)")
        if "rowTag" not in cfg.options:
            raise ValueError("xml source requires options={'rowTag': <element>}")
        schema = StructType(
            [f for f in cfg.schema.fields if f.name != CORRUPT_COL]
        ).add(CORRUPT_COL, "string")
        # dict-merge (caller options win) instead of keyword expansion:
        # 'mode'/'columnNameOfCorruptRecord' are legal XML reader options,
        # and passing either in cfg.options would raise TypeError
        # ("multiple values for keyword argument") under the kwargs form.
        xml_opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL,
                    **cfg.options}
        return (
            spark.read.format("xml")
            .options(**xml_opts)
            .schema(schema)
            .load(cfg.path)
        )
    if fmt not in ("csv", "json"):
        raise ValueError(f"unsupported file source format: {cfg.format!r}")
    if cfg.schema is None:
        raise ValueError(f"{fmt} source requires an explicit schema (no inference)")
    schema = StructType(
        [f for f in cfg.schema.fields if f.name != CORRUPT_COL]
    ).add(CORRUPT_COL, "string")
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **cfg.options,
    }
    raw = spark.read.text(cfg.path).filter(F.length(F.trim(F.col("value"))) > 0)
    if fmt == "csv":
        # from_csv takes a DDL schema string, not a StructType
        parsed = F.from_csv(F.col("value"), schema.toDDL(), opts)
    else:
        parsed = F.from_json(F.col("value"), schema, opts)
    return raw.select(parsed.alias("_r")).select("_r.*")


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Multimodal ingestion source: one row per file with the raw bytes
    as an opaque ``content: binary`` column plus path/mtime/length
    metadata — exactly the (payload, typed-metadata) shape the L5
    multimodal operators consume (operators/multimodal.py attaches a
    metadata struct and decodes via mapInPandas; bytes never visit the
    driver).

    Scale notes: Spark packs many small files per task (bin-packing by
    ``spark.sql.files.maxPartitionBytes``), so millions of images
    schedule fine; a single file must fit in one task's memory (the 2
    GiB column limit) — chunk video into segments upstream. Listing is
    driver-side — for 10^8+ objects, land a manifest table instead and
    read paths from it.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the dead-letter column, quarantined rows).

    The quarantine frame keeps the full row — partially-parsed fields
    plus the raw line in ``_corrupt_record`` — triage needs the context.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.filter(F.lit(False))
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
