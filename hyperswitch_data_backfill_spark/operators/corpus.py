"""Corpus curation — training-data pipeline stages beyond SURVEY §2.11 L1-L8.

The four standard curation passes an LLM data pipeline runs between raw
crawl and tokenizer (chunking, PII scrubbing, repetition filtering,
benchmark decontamination) plus domain-mix sampling. Like operators/text.py,
everything is pure Spark SQL expressions (split / higher-order functions /
regexp) so the hot path stays in whole-stage codegen; the only shuffles
are the aggregates/joins each stage inherently needs.

Tokenization contract: ``split(text, ' ')`` with empties removed —
byte-identical between Spark and the DuckDB oracles (see text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.operators.text import spread_docs, tokens
from hyperswitch_data_backfill_spark.registry import register

CHUNK_TOKENS = 64   # window size
CHUNK_STRIDE = 48   # 16-token overlap between consecutive chunks


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS start
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(least({CHUNK_TOKENS}, len(toks) - start) AS BIGINT) AS chunk_tokens,
           array_to_string(toks[start + 1 : start + {CHUNK_TOKENS}], ' ') AS chunk_text
    FROM s
    """,
    doc="Curation: split each document into overlapping token windows "
        f"({CHUNK_TOKENS} tokens, stride {CHUNK_STRIDE}) — the standard "
        "context-window chunker feeding an embedding or pretraining stage. "
        "Fully declarative: sequence → posexplode → slice, no UDF, no "
        "shuffle at all (chunking is per-row); output inherits the scan's "
        "partitioning. At 100 TB this is a map-only stage that fuses with "
        "the scan.",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") > 0)
        .select("doc_id", F.col("toks"), F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.least(F.lit(CHUNK_TOKENS), F.size("toks") - F.col("start"))
            .cast("bigint")
            .alias("chunk_tokens"),
            F.concat_ws(" ", F.slice("toks", F.col("start") + 1, F.lit(CHUNK_TOKENS))).alias(
                "chunk_text"
            ),
        )
    )


_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_CARD_PAT = r"[0-9]{12,19}"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH blob AS (
        -- the fixtures carry no natural PII, so both engines build the
        -- same deterministic contact blob from customer columns; the
        -- operator under test is the redaction expression itself
        SELECT c_custkey,
               'reach ' || lower(replace(c_name, '#', '.')) || '@example.com pay '
                 || lpad(CAST(c_custkey * 7919 + 1234567 AS VARCHAR), 16, '0')
                 || ' ok' AS blob
        FROM customer
    )
    SELECT c_custkey,
           regexp_replace(regexp_replace(blob, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                          '{_CARD_PAT}', '<CARD>', 'g') AS redacted,
           CAST(len(regexp_extract_all(blob, '{_EMAIL_PAT}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(blob, '{_CARD_PAT}')) AS BIGINT) AS n_cards,
           CAST(length(blob) AS BIGINT) AS n_chars_in
    FROM blob
    """,
    doc="Curation: PII scrubbing — regexp redaction of emails and long "
        "digit runs (card/account numbers) with per-row match counts. "
        "Pure codegen regexp_replace/regexp_extract_all: map-only, no "
        "shuffle, fuses with the scan at 100 TB. Patterns are RE2/Java "
        "common-subset so engine parity is exact.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    blob = F.concat(
        F.lit("reach "),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com pay "),
        F.lpad((F.col("c_custkey") * 7919 + 1234567).cast("string"), 16, "0"),
        F.lit(" ok"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(blob, _EMAIL_PAT, "<EMAIL>"), _CARD_PAT, "<CARD>"
    )
    return cust.select(
        "c_custkey",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(blob, F.lit(_EMAIL_PAT), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(blob, F.lit(_CARD_PAT), 0)).cast("bigint").alias("n_cards"),
        F.length(blob).cast("bigint").alias("n_chars_in"),
    )


REPETITION_THRESHOLD = 0.10  # Gopher-style: flag if top bigram > 10% of all


@register(
    "text_repetition_gate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ), ix AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2
    ), b AS (
        SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram FROM ix
    ), c AS (
        SELECT doc_id, bigram, COUNT(*) AS n FROM b GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS top_bigram_n,
           CAST(SUM(n) AS BIGINT) AS total_bigrams,
           ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_bigram_ratio,
           CAST(MAX(n) AS DOUBLE) / SUM(n) > {REPETITION_THRESHOLD} AS flagged
    FROM c GROUP BY doc_id
    """,
    doc="Curation: repetition filter — per-document top-bigram fraction "
        "(Gopher/C4-style repetitious-text gate). Bigrams are built "
        "declaratively (transform over an index sequence), then two "
        "map-side-combined aggregates keyed by doc_id: each shuffle moves "
        "only per-partition (doc,bigram,count) partials, and per-doc "
        "state is bounded by document length, not corpus size. (A "
        "pre-explode repartition(doc_id) that makes both aggs exchange-"
        "free was measured 10x slower here: it forfeits map-side combine "
        "and pins 200 non-coalesced partitions.)",
)
def text_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))

    def bigram(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        )

    ratio = F.col("top_bigram_n").cast("double") / F.col("total_bigrams")
    return (
        spread_docs(docs).select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigram(F.col("toks"))).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("top_bigram_n"),
            F.sum("n").cast("bigint").alias("total_bigrams"),
        )
        .select(
            "doc_id",
            "top_bigram_n",
            "total_bigrams",
            F.round(ratio, 6).alias("top_bigram_ratio"),
            (ratio > REPETITION_THRESHOLD).alias("flagged"),
        )
    )


DECONTAM_NGRAM = 5
DECONTAM_BENCH_MOD = 97  # doc_id % 97 == 0 → stand-in benchmark set


@register(
    "decontam_ngram",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ), ix AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {DECONTAM_NGRAM - 1})) AS i
        FROM t WHERE len(toks) >= {DECONTAM_NGRAM}
    ), grams AS (
        SELECT doc_id, array_to_string(toks[i : i + {DECONTAM_NGRAM - 1}], ' ') AS g
        FROM ix
    ), bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
    ), hit AS (
        SELECT DISTINCT doc_id FROM grams WHERE g IN (SELECT g FROM bench)
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id % {DECONTAM_BENCH_MOD} <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM hit)
    """,
    doc=f"Curation: benchmark decontamination — drop any training document "
        f"sharing a {DECONTAM_NGRAM}-gram with the held-out benchmark set "
        f"(stand-in: doc_id % {DECONTAM_BENCH_MOD} == 0). The benchmark "
        "n-gram set is distinct-aggregated (small by construction — eval "
        "suites are MBs, not TBs) and broadcast into a semi-join against "
        "the corpus n-gram stream, then contaminated ids anti-join back. "
        "Corpus n-grams are a map-only explode that never materializes: "
        "they flow straight into the broadcast-hash semi-join probe.",
)
def decontam_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))

    def grams(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - (DECONTAM_NGRAM - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + k) for k in range(DECONTAM_NGRAM)]
            ),
        )

    exploded = (
        spread_docs(docs).select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= DECONTAM_NGRAM)
        .select("doc_id", F.explode(grams(F.col("toks"))).alias("g"))
    )
    bench = (
        exploded.where(F.col("doc_id") % DECONTAM_BENCH_MOD == 0).select("g").distinct()
    )
    hit = (
        exploded.join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
        .join(hit, "doc_id", "left_anti")
        .select("doc_id", "source", "n_chars")
    )


@register(
    "sample_weighted_mix",
    oracle="""
    SELECT doc_id, source,
           ROUND(((CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 4) + 1) * 0.2, 1)
               AS keep_prob
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
          < ((CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 4) + 1) * 20
    """,
    doc="Curation: domain-mix weighted sampling — per-source keep "
        "probability (here derived from the source id; in production a "
        "broadcast weights dimension) applied via the same md5(doc_id) "
        "bucket as sample_stable_split, so the kept set is deterministic, "
        "engine-portable, and stable under re-runs/repartitioning. "
        "Map-only: a pure per-row expression with no shuffle — the "
        "standard way to hit a target domain mixture at 100 TB without "
        "a global sort or sample().",
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract(F.col("source"), "[0-9]+", 0).cast("bigint")
    keep_pct = ((src_num % 4) + 1) * 20  # 20/40/60/80 %
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 100
    return (
        docs.where(bucket < keep_pct)
        .select(
            "doc_id",
            "source",
            F.round(keep_pct.cast("double") / 100, 1).alias("keep_prob"),
        )
    )


PACK_BUDGET = 512  # tokens per packed training sequence


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % {PACK_BUDGET} AS BIGINT) AS offset_in_seq,
           ((cum - 1) // {PACK_BUDGET}) <> ((cum - n_tokens) // {PACK_BUDGET})
               AS spans_boundary
    FROM c
    """,
    doc=f"Curation: training-sequence packing — concatenate each source's "
        f"documents in doc_id order and chop into {PACK_BUDGET}-token "
        "context windows (the standard GPT-style pack): every document "
        "gets the sequence it starts in, its token offset inside that "
        "sequence, and whether it spans a boundary. One window prefix-sum "
        "per source — a single shuffle on the source key; deterministic "
        "packing is inherently a per-stream sequential pass, so the "
        "stream key (source here; source×day in production) is the "
        "parallelism unit. No driver state, no UDF.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = docs.select(
        "doc_id", "source", n_tok.cast("bigint").alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    # Integer `div`, not double `/` + cast: exact at any corpus size.
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {PACK_BUDGET}").alias("seq_id"),
        F.expr(f"(cum - n_tokens) % {PACK_BUDGET}").alias("offset_in_seq"),
        F.expr(
            f"((cum - 1) div {PACK_BUDGET}) != ((cum - n_tokens) div {PACK_BUDGET})"
        ).alias("spans_boundary"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the 100 TB scale path for decontam_ngram.
#
# decontam_ngram broadcasts the DISTINCT benchmark n-gram STRINGS into a
# semi-join. Fine while eval suites are MBs; but a large decontamination
# list (every n-gram of every benchmark + held-out set, easily 10^9
# grams) would blow the broadcast. The classic fix is a Bloom filter:
# constant-size bitset, zero false negatives (no contaminated doc
# survives), tunable false-positive rate (a few extra clean docs
# dropped — harmless for training-data curation).
#
# Spark 4's SQL surface doesn't expose bloom_filter_agg/might_contain as
# public functions, so the filter is built AS A DATAFRAME PLAN:
# gram → k Kirsch-Mitzenmacher positions (h1 + i*h2 over xxhash64, two
# seeds) → (word, bit) → groupBy word with bit_or partial aggregation.
# The materialized bitset is O(BLOOM_M/64) longs — CONSTANT in corpus
# size — and rides a single-row broadcast join back onto the probe side,
# where the k probes are pure codegen bit arithmetic. No Python worker,
# no giant broadcast set, one shuffle (the word-group agg over the
# benchmark slice only).
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 18  # bits; ~10 bits/gram at fixture scale → p ≈ 1e-2
BLOOM_K = 5        # probes; optimal k ≈ (m/n) ln 2


def _bloom_positions(g: Column) -> list[Column]:
    """K bit positions via Kirsch-Mitzenmacher double hashing: pos_i =
    (h1 + i*h2) mod m — two xxhash64 seeds give k independent-enough
    probes without k hash evaluations."""
    # reduce both hashes mod m BEFORE combining: full-range i*h2 would
    # overflow int64 under ANSI mode, and (a + i·b) mod m is unchanged
    h1 = F.pmod(F.xxhash64(g), F.lit(BLOOM_M))
    h2 = F.pmod(F.xxhash64(g, F.lit(1)), F.lit(BLOOM_M))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(BLOOM_M)) for i in range(BLOOM_K)]


def build_bloom(grams: DataFrame, col: str = "g") -> list[int]:
    """Aggregate a gram column into a Bloom bitset (list of BLOOM_M/32
    32-bit words in bigints). The driver transfer is the CONSTANT-size
    bitset, never the gram set: explode k positions, map-side-combined
    bit_or per word. 32-bit words keep every value positive, so the
    probe side can test bits with exact power-of-two division (Spark's
    shiftleft/shiftright builtins take only literal shift amounts)."""
    pos = grams.select(
        F.explode(F.array(*_bloom_positions(F.col(col)))).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 32).cast("int").alias("w"),
            # 2^(p%32) exactly: double pow is exact for exponents <= 32
            F.pow(F.lit(2.0), (F.col("p") % 32).cast("int")).cast("bigint").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    bitset = [0] * (BLOOM_M // 32)
    for r in words:
        bitset[r["w"]] = r["bits"]
    return bitset


def might_contain(bloom_col: Column, g: Column) -> Column:
    """Codegen Bloom probe: all k bits set → maybe-member. bloom_col is
    an array<bigint> column (the broadcast single-row bitset of 32-bit
    words). Bit test: floor(word / 2^bit) odd — exact because word <
    2^32 and 2^bit are both exactly representable doubles."""
    conds = [
        F.pmod(
            F.floor(
                F.element_at(bloom_col, (p / 32).cast("int") + 1)
                / F.pow(F.lit(2.0), (p % 32).cast("int"))
            ).cast("bigint"),
            F.lit(2),
        )
        == 1
        for p in _bloom_positions(g)
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


@register(
    "decontam_bloom",
    oracle=None,  # Bloom FPs drop a few extra clean docs — output is
    # hash-incomparable to an exact engine; guarded by pytest instead:
    # survivors ⊆ exact survivors (no false negatives, bounded extra drops).
    doc=f"Curation at 100 TB: Bloom-filter benchmark decontamination — "
        f"same contract as decontam_ngram (drop any training doc sharing "
        f"a {DECONTAM_NGRAM}-gram with the doc_id % {DECONTAM_BENCH_MOD} "
        "benchmark slice) but the membership structure is a constant-size "
        f"bitset ({BLOOM_M} bits, {BLOOM_K} probes) instead of a broadcast "
        "string set. Zero false negatives by construction; false "
        "positives only ever drop extra CLEAN docs. Probe side is pure "
        "codegen bit arithmetic on a single-row broadcast array — the "
        "n-gram stream never shuffles. Envelope gap: the driver-hashed "
        "twin (decontam_bloom_fn) proves zero FALSE NEGATIVES per doc; "
        "it cannot see a false-positive blow-up (over-dropping clean "
        "docs) — the FP budget (extra drops ≤ max(2, n/50), probe FP "
        "rate ≤ 1%) lives only in pytest (test_quality_guards.py).",
)
def decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))

    def grams(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - (DECONTAM_NGRAM - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + k) for k in range(DECONTAM_NGRAM)]
            ),
        )

    exploded = (
        spread_docs(docs).select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= DECONTAM_NGRAM)
        .select("doc_id", F.explode(grams(F.col("toks"))).alias("g"))
    )
    bench_grams = exploded.where(F.col("doc_id") % DECONTAM_BENCH_MOD == 0).select("g")
    bitset = build_bloom(bench_grams)
    bloom_row = spark.createDataFrame([(bitset,)], "bloom array<bigint>")
    hit = (
        exploded.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
        .join(F.broadcast(bloom_row))
        .where(might_contain(F.col("bloom"), F.col("g")))
        .select("doc_id")
        .distinct()
    )
    return (
        docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
        .join(hit, "doc_id", "left_anti")
        .select("doc_id", "source", "n_chars")
    )


BUILD_GATE_LO = 100   # n_chars quality gate bounds
BUILD_GATE_HI = 500


@register(
    "pipeline_corpus_build",
    oracle=f"""
    WITH gated AS (
        SELECT * FROM documents
        WHERE n_chars BETWEEN {BUILD_GATE_LO} AND {BUILD_GATE_HI}
    ), exact AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ), tok AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM exact
    ), sh AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tokens) - 2),
                          i -> array_to_string(tokens[i:i+3], ' '))) AS shingle
            FROM tok WHERE len(tokens) >= 4
        ) x
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), raw_pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), losers AS (
        SELECT DISTINCT id_b AS doc_id
        FROM raw_pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
    ), survivors AS (
        SELECT e.* FROM exact e WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
    ), all_tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), all_grams AS (
        SELECT doc_id, array_to_string(toks[i : i + {DECONTAM_NGRAM - 1}], ' ') AS g
        FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {DECONTAM_NGRAM - 1})) AS i
            FROM all_tok WHERE len(toks) >= {DECONTAM_NGRAM}
        )
    ), bench AS (
        SELECT DISTINCT g FROM all_grams WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
    ), hit AS (
        SELECT DISTINCT a.doc_id FROM all_grams a
        WHERE a.g IN (SELECT g FROM bench)
    ), clean AS (
        SELECT s.* FROM survivors s
        WHERE s.doc_id % {DECONTAM_BENCH_MOD} <> 0
          AND s.doc_id NOT IN (SELECT doc_id FROM hit)
    ), counted AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        FROM clean
    ), packed AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM counted
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // {{pack}} AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % {{pack}} AS BIGINT) AS offset_in_seq
    FROM packed
    """.format(pack=PACK_BUDGET),
    doc="Flagship composed corpus build — the five standard curation "
        "stages of an LLM data pipeline in ONE DataFrame lineage: "
        "(1) length quality gate (pushed into the parquet scan), "
        "(2) exact dedup (min-id survivor per text), (3) near-dup drop "
        "(higher doc_id of every shingle-jaccard >= 0.5 pair, via the "
        "posting-bucket pair machinery — dedup.jaccard_pairs on the "
        "ALREADY-gated frame, so the expensive stage sees only "
        "gate+exact survivors), (4) benchmark decontamination (bench "
        "n-gram set distinct-aggregated and broadcast, semi-join "
        "probe, anti-join back — bench = doc_id % DECONTAM_BENCH_MOD, DECONTAM_NGRAM-grams), (5) greedy "
        "sequence packing per source (cumulative token counts → "
        "seq_id/offset). Each stage is independently oracle-verified "
        "elsewhere (text_length_quantile_gate, dedup_exact, "
        "dedup_ngram_jaccard, decontam_ngram, pack_sequences); this "
        "key verifies their COMPOSITION — filters fused into one scan, "
        "stage outputs flowing without materialization, the plan a "
        "user's real corpus build would run.",
)
def pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hyperswitch_data_backfill_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(F.col("n_chars").between(BUILD_GATE_LO, BUILD_GATE_HI))
    # hash-prefixed exact-dedup window — same reshape and same
    # collision-safety argument as dedup_exact (r17): partition keys
    # still include the full text, the hash only leads the sort so
    # comparisons resolve on 8 bytes instead of the document payload
    w = Window.partitionBy(F.xxhash64("text"), F.col("text")).orderBy("doc_id")
    exact = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    losers = (
        jaccard_pairs(exact)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    survivors = exact.join(losers, "doc_id", "left_anti")

    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - (DECONTAM_NGRAM - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("toks", i + k) for k in range(DECONTAM_NGRAM)]
        ),
    )
    bench = (
        docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
        .select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= DECONTAM_NGRAM)
        .select(F.explode(grams).alias("g"))
        .distinct()
    )
    # probe only the survivors' grams — hits outside the survivor set
    # can't change the anti-join, so the full-corpus probe the oracle
    # writes (for SQL clarity) is provably equivalent and this side
    # skips re-scanning dropped docs
    hit = (
        survivors.select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= DECONTAM_NGRAM)
        .select("doc_id", F.explode(grams).alias("g"))
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = (
        survivors.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
        .join(hit, "doc_id", "left_anti")
    )
    counted = clean.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    cum = F.sum("n_tokens").over(
        Window.partitionBy("source").orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    packed = counted.withColumn("cum", cum)
    start = F.col("cum") - F.col("n_tokens")
    return packed.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor(start / PACK_BUDGET).cast("bigint").alias("seq_id"),
        (start % PACK_BUDGET).cast("bigint").alias("offset_in_seq"),
    )


@register(
    "decontam_bloom_fn",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ), ix AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {DECONTAM_NGRAM - 1})) AS i
        FROM t WHERE len(toks) >= {DECONTAM_NGRAM}
    ), grams AS (
        SELECT doc_id, array_to_string(toks[i : i + {DECONTAM_NGRAM - 1}], ' ') AS g
        FROM ix
    ), bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
    ), hit AS (
        SELECT DISTINCT doc_id FROM grams WHERE g IN (SELECT g FROM bench)
    )
    SELECT d.doc_id, TRUE AS bloom_dropped
    FROM documents d
    WHERE d.doc_id % {DECONTAM_BENCH_MOD} <> 0
      AND d.doc_id IN (SELECT doc_id FROM hit)
    """,
    doc="Curation-err (round-7): the Bloom decontaminator's no-false-"
        "negative guarantee, driver-hashed. The oracle recomputes the "
        "EXACT contaminated set (same SQL as decontam_ngram's hit CTE) "
        "and asserts each of those docs was dropped by decontam_bloom — "
        "a Bloom false negative (impossible unless the probe/build bit "
        "math diverges) would flip its row to FALSE. Complements the "
        "pytest guard (survivors ⊆ exact survivors, bounded extra "
        "drops) with per-doc driver evidence.",
)
def decontam_bloom_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))

    def grams(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - (DECONTAM_NGRAM - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + k) for k in range(DECONTAM_NGRAM)]
            ),
        )

    exploded = (
        spread_docs(docs).select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= DECONTAM_NGRAM)
        .select("doc_id", F.explode(grams(F.col("toks"))).alias("g"))
    )
    bench = (
        exploded.where(F.col("doc_id") % DECONTAM_BENCH_MOD == 0).select("g").distinct()
    )
    exact_hit = (
        exploded.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    bloom_kept = decontam_bloom(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("_kept")
    )
    return exact_hit.join(bloom_kept, "doc_id", "left").select(
        "doc_id", F.col("_kept").isNull().alias("bloom_dropped")
    )


TEMP_MIX_EXP = 0.5  # temperature alpha: weight_l ∝ n_l^0.5 (XLM-R style)


@register(
    "sample_temperature_mix",
    oracle="""
    WITH stats AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS corpus_n,
               SUM(CAST(ROUND(sqrt(n), 6) AS DECIMAL(18,6))) AS s_sum
        FROM stats
    ), e AS (
        SELECT lang, n,
               ROUND(((CAST(CAST(ROUND(sqrt(n), 6) AS DECIMAL(18,6)) AS DOUBLE)
                       / CAST(s_sum AS DOUBLE)) * corpus_n) / n, 6) AS epochs
        FROM stats, tot
    ), d AS (
        SELECT doc_id, d.lang, epochs,
               CAST(FLOOR(epochs) AS BIGINT) AS full_copies,
               CAST(ROUND((epochs - FLOOR(epochs)) * 1000000) AS BIGINT) AS thresh,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 1000000 AS bucket
        FROM documents d JOIN e USING (lang)
    )
    SELECT doc_id, lang, CAST(gs AS INTEGER) AS copy_id, epochs
    FROM d, UNNEST(generate_series(0, full_copies - 1)) AS t(gs)
    UNION ALL
    SELECT doc_id, lang, CAST(full_copies AS INTEGER) AS copy_id, epochs
    FROM d WHERE bucket < thresh
    """,
    doc="Curation: temperature-based source/language mixing — the "
        "multilingual-pretraining rebalancer (mix weight ∝ n^0.5, "
        "XLM-R style): low-resource languages are UPSAMPLED (epochs>1 → "
        "integer repeat copies + an md5-bucket-selected fractional "
        "copy), the high-resource head is downsampled (epochs<1 → "
        "fractional copy only), holding total size ≈ corpus size. "
        "Emits (doc_id, lang, copy_id, epochs) — the materialized "
        "training-mix manifest. Determinism dance for the oracle: "
        "per-language sqrt weights rounded to DECIMAL(18,6) so the "
        "weight SUM is exact in both engines, one fixed-association "
        "double expression for epochs, fractional selection as an "
        "integer-bucket compare — no float comparison anywhere. Scale "
        "shape: the language stats are a tiny aggregate broadcast back "
        "onto the corpus; the copy fan-out is a per-row explode — one "
        "small shuffle (stats) + map-only rewrite, no global sample().",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = stats.agg(
        F.sum("n").cast("bigint").alias("corpus_n"),
        F.sum(F.round(F.sqrt("n"), 6).cast("decimal(18,6)")).alias("s_sum"),
    )
    e = stats.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.round(
            (
                (
                    F.round(F.sqrt("n"), 6).cast("decimal(18,6)").cast("double")
                    / F.col("s_sum").cast("double")
                )
                * F.col("corpus_n")
            )
            / F.col("n"),
            6,
        ).alias("epochs"),
    )
    enriched = docs.join(F.broadcast(e), "lang").select(
        "doc_id",
        "lang",
        "epochs",
        F.floor("epochs").cast("bigint").alias("full_copies"),
        F.round((F.col("epochs") - F.floor("epochs")) * 1000000)
        .cast("bigint")
        .alias("thresh"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 1000000
        ).alias("bucket"),
    )
    copies = F.concat(
        F.when(
            F.col("full_copies") >= 1,
            F.sequence(F.lit(0).cast("bigint"), F.col("full_copies") - 1),
        ).otherwise(F.array().cast("array<bigint>")),
        F.when(
            F.col("bucket") < F.col("thresh"), F.array(F.col("full_copies"))
        ).otherwise(F.array().cast("array<bigint>")),
    )
    return enriched.select(
        "doc_id", "lang", F.explode(copies).alias("copy_id"), "epochs"
    ).select("doc_id", "lang", F.col("copy_id").cast("int").alias("copy_id"), "epochs")
