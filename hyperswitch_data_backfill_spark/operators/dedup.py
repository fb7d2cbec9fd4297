"""Deduplication — SURVEY §2.11 L1/L2 (north-star mandate).

Four tiers, cheapest first — the standard pretraining-data funnel:

1. ``dedup_exact`` — hash-group on content, keep the lowest doc_id.
   One shuffle on the dedup key; at 100 TB group on ``md5(text)`` so
   the shuffled key is 16 bytes, not the document.
2. ``dedup_ngram_jaccard`` — *exact* near-dup pairs via the distinct-
   shingle inverted index: explode shingles → self-join on shingle →
   pair-count = intersection; |A∪B| from per-doc counts. The join key
   is a shingle, so only documents sharing a shingle ever meet —
   no cross join. SQL-expressible → full DuckDB oracle.
3. ``dedup_minhash`` — MinHash+LSH candidates: 32 hash functions,
   8 bands × 4 rows; documents collide only if a band signature
   matches. This is the 100 TB path: cost is O(docs × shingles) for
   signatures plus a band-bucket shuffle, never O(pairs).
4. ``dedup_simhash`` — 32-bit SimHash fingerprints; near-dups are
   fingerprints at Hamming distance ≤3, found exhaustively via 4×8-bit
   banding (pigeonhole: a ≤3-bit difference leaves ≥1 band intact).

Shingle contract (shared with the oracles): 4-token shingles over
space-split tokens, distinct per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyperswitch_data_backfill_spark.catalog import load_table, spread_fanout
from hyperswitch_data_backfill_spark.registry import register

SHINGLE_K = 4
MINHASH_N = 32
LSH_BANDS = 8
LSH_ROWS = 4  # MINHASH_N = LSH_BANDS * LSH_ROWS
JACCARD_THRESHOLD = 0.5

# (applicationId, sf_dir) -> [(doc_id, cluster_id)] — see dedup_clusters.
_CLUSTER_LABEL_CACHE: dict[tuple[str, str], list] = {}

# Pair-graph size up to which dedup_clusters union-finds on the driver
# instead of looping distributed jobs. 2M edges ≈ 32 MB of longs — cheap
# against driver memory, and path-halving union-find labels it in well
# under a second.
_EDGE_DRIVER_LIMIT = 2_000_000

# Shared DuckDB oracle fragments: ONE definition of the shingle/pair graph
# serves dedup_ngram_jaccard, dedup_clusters, and dedup_survivors, so the
# pair definition cannot drift between the three oracles.
_PAIR_PREFIX = f"""
    WITH RECURSIVE tok AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tokens) - {SHINGLE_K - 2}),
                          i -> array_to_string(tokens[i:i+{SHINGLE_K - 1}], ' '))) AS shingle
            FROM tok WHERE len(tokens) >= {SHINGLE_K}
        ) x
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), raw_pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), scored_pairs AS (
        SELECT id_a, id_b, inter, sa.n AS n_a, sb.n AS n_b,
               CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
        FROM raw_pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
"""

# Transitive closure of the thresholded pair graph → (doc_id, cluster_id).
_CLUSTER_SQL = _PAIR_PREFIX + f"""
    , pairs AS (
        SELECT id_a, id_b FROM scored_pairs WHERE jac >= {JACCARD_THRESHOLD}
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ), reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), lab AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    )
"""


def driver_union_find(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Min-label union-find (path halving, union-by-min-root) over a
    driver-sized edge list → sorted (node, root) labels.

    Union-by-min keeps the smaller id as root, so the final root of each
    component is its minimum node — the same fixpoint as distributed
    min-label propagation and the recursive-CTE oracles. Shared by the
    shingle-graph (dedup_clusters) and embedding-graph
    (similarity.dedup_semantic_clusters) cluster operators."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted((x, find(x)) for x in parent)


def propagate_min_labels(pairs: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Distributed connected components: min-label propagation with
    pointer doubling over an (id_a, id_b) pair frame → (node, label).

    One action per round; the pair graph is localCheckpointed once;
    label state is O(clustered nodes), never corpus-sized. Doubling
    (label <- min(label, label[label])) halves chains each round, so
    ``max_rounds=16`` covers any diameter < 2^16. Raises instead of
    returning intermediate labels on non-convergence — a silent split
    would corrupt every downstream survivor selection."""
    edges = (
        pairs.unionByName(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        .toDF("src", "dst")
        .localCheckpoint(eager=True)  # pair graph computed once
    )
    # Round 0 folded into initialization: label = min(self, neighbors)
    # directly off the edge list — one aggregate instead of a full
    # propagate round (every src appears in edges, both directions).
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nb0"))
        .select(F.col("src").alias("node"), F.least("src", "nb0").alias("label"))
    )
    converged = False
    for _ in range(max_rounds):
        nb_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nb_min"))
        )
        stepped = labels.join(nb_min, labels.node == nb_min.src, "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nb_min", "label")).alias("label"),
        )
        # Pointer jump: also adopt the label of my current label —
        # min-labels are monotone, so label[label] ≤ label always holds
        # and chains collapse exponentially.
        parent = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("parent_label")
        )
        new_labels = (
            stepped.join(parent, "label", "left")
            .select(
                "node",
                "old_label",
                F.least(F.col("label"), F.coalesce("parent_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # Convergence test on the just-materialized frame — no extra join.
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels = new_labels.drop("old_label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"propagate_min_labels: no convergence in {max_rounds} rounds"
        )
    return labels.select("node", "label")


# Hard safety valve for the EXACT (uncapped) posting-list paths: a
# posting list of k members emits k(k-1)/2 pairs inside ONE task, so a
# stopword-like shingle shared by 100k docs is a 5-billion-pair task —
# an OOM, not a slow query. Fixture max document-frequency is 6 (sf0.01
# through sf1), so the valve never trips on oracle'd keys; on a real
# corpus the caller either passes max_bucket_members (max-df practice,
# exact over the filtered space) or hits a loud error instead of a
# silent quadratic blowup. 4096² pairs ≈ 8M structs per task — the
# largest single-task burst we accept.
MAX_POSTING_LIST = 4096

# Broadcast valve for HAVING-gated "hot key" sets: tiny by construction
# on every fixture, but nothing bounds them on arbitrary corpora (a
# boilerplate-heavy crawl can have tens of millions of ubiquitous
# spans). Past the cap the join simply falls back to a shuffle
# semi/anti join — same results, no driver-sized materialization.
MAX_BROADCAST_KEYS = 1_000_000


def guard_posting_buckets(
    buckets: DataFrame, size_expr, op: str, *, pair_budget: bool = False
) -> DataFrame:
    """In-plan posting-list valve: ``assert_true(size <= cap)`` fused
    into the bucket stage, so the moment a bucket exceeds the budget
    the TASK raises our message — before the k² pair explosion runs,
    with zero extra jobs (a separate probe would recompute the full
    signature/shingle pass; a checkpoint would pay materialization +
    job round-trips — both measured regressions on dedup_minhash).
    assert_true returns NULL on success, so the isNull() filter keeps
    every legal row. Applied only on the uncapped exact paths; capped
    paths are bounded by construction.

    ``pair_budget=True`` compares ``size_expr`` (a per-bucket PAIR
    count, e.g. hist×batch) against MAX_POSTING_LIST²/2 — the same
    single-task burst the member-count valve allows its k(k-1)/2
    emission, so cross-side emitters can't sneak a 2× burst past a
    per-side cap."""
    if pair_budget:
        bound = MAX_POSTING_LIST * MAX_POSTING_LIST // 2
        msg = (
            f"{op}: a single bucket would emit more than {bound} pairs "
            f"(the MAX_POSTING_LIST={MAX_POSTING_LIST} single-task "
            "budget) in one task. Pass max_bucket_members to drop "
            "stopword-like keys (standard max-df practice; scores stay "
            "exact over the filtered space)."
        )
    else:
        bound = MAX_POSTING_LIST
        msg = (
            f"{op}: a posting list exceeds MAX_POSTING_LIST="
            f"{MAX_POSTING_LIST} members - bucket-local pairing would emit "
            "O(n^2) pairs in one task. Pass max_bucket_members to drop "
            "stopword-like keys (standard max-df practice; scores stay "
            "exact over the filtered space)."
        )
    return buckets.filter(
        F.assert_true(size_expr <= F.lit(bound), F.lit(msg)).isNull()
    )


def bounded_broadcast(df: DataFrame, cap: int = MAX_BROADCAST_KEYS) -> DataFrame:
    """broadcast() only when the key set provably fits: one bounded
    count (limit cap+1) decides; past the cap the frame is returned
    unhinted so the join falls back to a shuffle semi/anti join —
    identical results, no unbounded broadcast.

    Cost contract (r11 ADVICE — the probe is EAGER): the limit-count
    executes ``df``'s plan at call time, and the real plan executes it
    again — every call site pays the hot-key aggregate twice and turns
    lazy DataFrame construction into a Spark job. That is the deliberate
    trade at the sites using it (opt-in capped dedup modes, where the
    HAVING-gated hot-key frame is one map-side-combined aggregate over
    an already-needed pass, and the limit makes the probe terminate
    early past the cap): a mis-sized broadcast OOMs the driver, a
    shuffle-join default gives up the 10-100× broadcast win on the
    common tiny case. Callers on a hot path that cannot afford the
    second execution should persist ``df`` first or decide from their
    own cardinality knowledge."""
    return F.broadcast(df) if df.limit(cap + 1).count() <= cap else df


def shingles_df(docs: DataFrame, k: int = SHINGLE_K,
                with_count: bool = False) -> DataFrame:
    """(doc_id, shingle) — distinct k-token shingles per document;
    ``with_count=True`` adds ``n`` = the doc's distinct-shingle count.

    Repartitions first: shingling fans out ~|tokens| per doc, and a
    small parquet input arrives as one split — without the spread the
    whole fan-out runs on one core. At 100 TB the input has thousands
    of splits and AQE coalesces this to a no-op-sized shuffle; locally
    it is what engages all cores.

    ``n`` is ``size()`` of the shingle array BEFORE the explode — the
    same number a post-explode ``count() OVER (PARTITION BY doc_id)``
    yields (explode emits exactly one row per element and concat_ws
    never produces null elements), without the per-partition Sort +
    Window pass over the full shingle fan-out that the window form
    costs (r16, guide §2.4: the fan-out is the big intermediate —
    never re-sort it to learn something the pre-explode row knew).

    Shape note (r16, measured 2.2× the other way before the fix): n
    rides INSIDE the exploded struct, not as a sibling column of an
    ``explode(_sh)`` attribute. The naive forms both backfire —
    ``size(_sh)`` projected after the explode forces Generate to carry
    the whole array to every exploded row, and ``explode(<attribute>)``
    triggers InferFiltersFromGenerate, whose ``size(_sh) > 0`` guard
    gets alias-inlined by predicate pushdown below the spread exchange,
    re-running the entire shingle transform serialized on the scan
    task. A costly generator child (the transform) is exempt from the
    inference, exactly like the plain-explode branch below.
    """
    docs = spread_fanout(docs, "doc_id")
    # Materialize the token array as a column BEFORE the per-shingle
    # lambda: referencing the raw split(...) expression inside the
    # transform would inline it at every element access, re-splitting
    # the document once per shingle — O(tokens²) per doc (measured 30×
    # on the bigram twin in text_ngram_freq).
    docs = docs.withColumn("_toks", F.split(F.col("text"), " "))
    sh = F.when(
        F.size("_toks") >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice("_toks", i, k)),
            )
        ),
    ).otherwise(F.array())
    if with_count:
        docs = docs.withColumn("_sh", sh)
        return (
            docs.select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.col("_sh"),
                        lambda x: F.struct(
                            x.alias("shingle"), F.size("_sh").alias("n")
                        ),
                    )
                ).alias("_p"),
            )
            .select(
                "doc_id", F.col("_p.n").alias("n"),
                F.col("_p.shingle").alias("shingle"),
            )
        )
    return docs.select("doc_id", F.explode(sh).alias("shingle"))


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) t WHERE rn = 1
    """,
    doc="L1: exact content dedup, deterministic survivor (lowest doc_id). "
        "At 100 TB: partition by md5(text) — 16-byte shuffle key, and the "
        "window degenerates to a min-reduce per key.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Hash-prefixed window key (r17, guide §2.3 "narrower types"): the
    # window must still partition per TEXT (the hash alone would merge
    # colliding texts into one survivor group — wrong), but leading
    # with xxhash64(text) makes the sort resolve almost every
    # comparison on 8 uniformly-distributed bytes; the full text is
    # compared only within equal-hash groups (true duplicates plus
    # vanishing collisions). The vocabulary-generated corpus is
    # prefix-heavy, so the sorter's 8-byte string prefix kept
    # tie-breaking into full-payload comparisons. Same groups, same
    # orderBy, identical survivors.
    w = Window.partitionBy(F.xxhash64("text"), F.col("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_PAIR_PREFIX + f"""
    SELECT id_a, id_b, inter, n_a, n_b, ROUND(jac, 6) AS jaccard
    FROM scored_pairs
    WHERE jac >= {JACCARD_THRESHOLD}
    """,
    doc="L2a: exact n-gram Jaccard near-dup pairs via the shingle inverted "
        "index (no cross join — docs only meet if they share a shingle). "
        "Integer set sizes → one double division → engine-exact.",
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_bucket_members: int | None = None
) -> DataFrame:
    return jaccard_pairs(load_table(spark, sf_dir, "documents"), max_bucket_members)


def jaccard_pairs(
    docs: DataFrame,
    max_bucket_members: int | None = None,
    *,
    threshold: float = JACCARD_THRESHOLD,
    shingle_k: int = SHINGLE_K,
) -> DataFrame:
    """Core of dedup_ngram_jaccard over any documents-shaped frame —
    split out so composed pipelines (corpus.pipeline_corpus_build) and
    the generic API (api.neardup_pairs) can run the pair stage on an
    already-filtered corpus. Defaults reproduce the registered fixture
    op exactly; ``threshold``/``shingle_k`` re-tune it for other
    corpora without touching the plan shape."""
    # Skew guard (the one skew surface here): a stopword-like shingle
    # shared by k docs makes a k-element posting array in ONE task and
    # k² pairs. ``max_bucket_members`` drops shingles whose document
    # frequency exceeds the cap from the WHOLE shingle space — before
    # set sizes are computed — so the emitted jaccard stays exact over
    # the df-filtered space (dropping only from the intersection would
    # silently deflate scores and lose genuine pairs). The hot set is
    # tiny by construction (shingles in >cap docs), so the anti-join
    # broadcasts. Default None = full-space oracle parity at fixture
    # scale; set it (e.g. 1000) on a real corpus — standard max-df
    # practice: ubiquitous shingles carry no near-dup signal.
    if max_bucket_members is not None:
        sh = shingles_df(docs, shingle_k)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_bucket_members)
            .select("shingle")
        )
        sh = sh.join(bounded_broadcast(hot), "shingle", "left_anti")
        # Set size must count the POST-filter space (scores stay exact
        # over the df-filtered shingle space), so it rides as a window
        # count over the exploded shingles — one shuffle on doc_id
        # instead of a separate aggregate + two re-joins against the
        # pair table (the pair table is the big intermediate at scale,
        # never enrich it twice).
        sh = sh.withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    else:
        # Uncapped mode: the set size is just the pre-explode array
        # size — carried through the explode for free, skipping the
        # full Sort + Window pass over the shingle fan-out (r16; the
        # window form cost one sort of every exploded row per
        # partition, the dominant per-task work of this operator).
        sh = shingles_df(docs, shingle_k, with_count=True)
    # Inverted-index pairing WITHOUT a self-join: group the postings per
    # shingle and emit pairs bucket-locally (same shape as the LSH band
    # pairing below). The input passes once, and there is no join whose
    # strategy AQE can re-roll between runs; pair volume is identical to
    # the self-join formulation — docs only meet if they share a shingle.
    # (With the df-filter above, every posting list is <= cap by
    # construction — no bucket-level truncation needed.)
    buckets = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_bucket_members is None:
        # Uncapped exact mode: refuse rather than OOM on a hot shingle
        # (r10 verdict item 3 — the guard must be executed logic, not a
        # docstring promise).
        buckets = guard_posting_buckets(
            buckets, F.size("members"), "jaccard_pairs"
        )
    pair_structs = F.expr(
        """
        flatten(transform(sequence(0, size(members) - 2), i ->
            transform(sequence(i + 1, size(members) - 1), j ->
                struct(members[i] AS a, members[j] AS b))))
        """
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("id_a"),
            F.col("p.b.doc_id").alias("id_b"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.select("id_a", "id_b", "inter", "n_a", "n_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(jac >= threshold)
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig array<bigint>[N]) MinHash signatures via xxhash64.

    One shuffle (groupBy doc_id) with map-side partial mins; the k hash
    functions are xxhash64 over shingle⊕seed — computed in codegen, no
    Python.
    """
    sh = shingles_df(docs)
    # k-th hash = xxhash64(shingle, k): the integer seed argument feeds
    # the same mixing rounds as the old string-concat seeds (full
    # per-k independence — a cheap rotation-mix family was tried and
    # REJECTED: its correlated hashes missed a 0.875-jaccard pair the
    # spark.ml MinHashLSH cross-check catches) while skipping
    # MINHASH_N per-row string allocations.
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(k))).alias(f"m{k}")
        for k in range(MINHASH_N)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"m{k}") for k in range(MINHASH_N)]).alias("sig")
    )


@register(
    "dedup_minhash",
    oracle=None,  # LSH banding is approximate by construction → rows-only
    doc="L2b: MinHash+LSH candidate pairs (32 perms, 8 bands × 4 rows) with "
        "estimated Jaccard = signature agreement rate. Scale shape: group "
        "by (band, band-hash) and pair WITHIN each bucket — one scan of the "
        "signatures, one shuffle, no self-join, never O(n²) pairs. Bucket "
        "skew (a viral shingle set) is bounded because identical band "
        "signatures imply near-identical docs. Envelope gap: the driver "
        "twins pin the extremes — precision at est ≥ 0.75 "
        "(dedup_minhash_precision) and full recall of the jac ≥ 0.9 band "
        "(dedup_minhash_recall_pairs) — but NOT gradual recall decay in "
        "the probabilistic 0.5–0.9 band, where only the pytest coverage "
        "floor (≥ 0.4 of strong exact pairs, test_quality_guards.py) "
        "trips.",
)
def dedup_minhash(
    spark: SparkSession, sf_dir: str, max_bucket_members: int | None = None
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_band_pairs(minhash_signatures(docs), max_bucket_members)


def minhash_band_pairs(
    sig: DataFrame, max_bucket_members: int | None = None
) -> DataFrame:
    """LSH banding + bucket-local pair emission over (doc_id, sig)
    signatures — the pair stage of dedup_minhash, split out (same
    pattern as jaccard_pairs) so the generic API can run it on
    arbitrary corpora. Identical plan to the registered op."""
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(F.slice("sig", bi * LSH_ROWS + 1, LSH_ROWS)).alias("bh"),
            )
            for bi in range(LSH_BANDS)
        ]
    )
    banded = sig.select("doc_id", "sig", F.explode(bands).alias("b")).select(
        "doc_id", "sig", "b.band", "b.bh"
    )
    # Same skew guard as dedup_ngram_jaccard: a bucket of k docs with an
    # identical band signature (k near-identical docs, e.g. boilerplate)
    # is k² pairs in one task. Over-full buckets are dropped; members of
    # such a bucket are (near-)exact dups that dedup_exact already
    # collapses upstream in any real pipeline. Uncapped mode refuses a
    # bucket past the hard valve instead of OOMing the task.
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_bucket_members is None:
        buckets = guard_posting_buckets(
            buckets, F.size("members"), "minhash_band_pairs"
        )
    else:
        buckets = buckets.filter(F.size("members") <= max_bucket_members)
    pair_structs = F.expr(
        """
        flatten(transform(sequence(0, size(members) - 2), i ->
            transform(sequence(i + 1, size(members) - 1), j ->
                struct(members[i] AS a, members[j] AS b))))
        """
    )
    pairs = buckets.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.a.doc_id").alias("id_a"),
        F.col("p.b.doc_id").alias("id_b"),
        F.col("p.a.sig").alias("sig_a"),
        F.col("p.b.sig").alias("sig_b"),
    )
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b))
    return (
        pairs.select("id_a", "id_b", (agree.cast("double") / MINHASH_N).alias("est_jaccard"))
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 32-bit token-hash bit-vote fingerprints.

    r16 (guide §2.1 "remove shuffles outright"): the bit votes are a
    per-document reduction over that document's own tokens, so they
    need no explode and no groupBy — the token-hash array is
    materialized once per row and 32 array-aggregate lanes count the
    set bits row-locally. Through r15 this exploded every token into a
    row and ran a 32-buffer groupBy(doc_id) aggregate: a full shuffle
    (32 longs per doc partial) plus row machinery per token, all to
    compute a value the row already had locally. Values are identical:
    bit j of the fingerprint is set iff more tokens vote 1 than -1,
    i.e. 2·ones_j > n — the same integer comparison as sum(±1) > 0 —
    and docs whose filtered token array is empty are dropped exactly
    as the explode emitted no rows for them. The spread keeps the
    row-local pass parallel on a one-split local fixture; at scale it
    is a no-op and the whole operator becomes shuffle-free up to the
    banding."""
    docs = spread_fanout(docs, "doc_id")
    hs = F.transform(
        F.filter(F.split("text", " "), lambda x: x != ""),
        lambda t: F.xxhash64(t),
    )
    d = docs.select("doc_id", hs.alias("_hs")).filter(F.size("_hs") > 0)
    n = F.size("_hs")
    def _ones(j: int):
        # closure, NOT a default arg: F.aggregate derives the lambda-var
        # count from the merge function's signature, so a `j=j` third
        # parameter would be rebound to a lambda-variable Column
        return F.aggregate(
            "_hs",
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)),
        )

    ones = [_ones(j) for j in range(32)]
    fp = sum(
        F.when(o * 2 > n, F.lit(2 ** j)).otherwise(F.lit(0))
        for j, o in enumerate(ones)
    )
    return d.select("doc_id", fp.cast("bigint").alias("simhash"))


@register(
    "dedup_simhash",
    oracle=None,  # depends on xxhash64 bit mixing → rows-only
    doc="L2c: 32-bit SimHash per document (token-hash bit voting), banded "
        "candidate generation: the fingerprint splits into 4 bands of 8 "
        "bits; by pigeonhole, any pair at Hamming distance ≤3 agrees on "
        "at least one full band, so banding finds ALL such pairs while "
        "only ever pairing within a (band, bits) bucket — one shuffle, "
        "no self-join, never O(n²). Candidates are then exact-filtered "
        "by bit_count(xor) ≤ 3 (pure codegen). Envelope gap: "
        "dedup_simhash_crosscheck proves banding COMPLETENESS at every "
        "driver sf (two independent pigeonhole partitions must emit the "
        "same pair set), but a degenerate fingerprint (bit voting gone "
        "wrong) passes both bandings identically; the brute-force "
        "all-pairs Hamming comparison that would catch it lives only in "
        "pytest at small sf (test_quality_guards.py).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(simhash_signatures(docs))


def simhash_pairs(
    sigs: DataFrame,
    rotate_bits: int = 0,
    *,
    max_hamming: int = 3,
    max_bucket_members: int | None = None,
) -> DataFrame:
    """Banded Hamming-≤3 pair generation over (doc_id, simhash).

    ``max_hamming`` may only be TIGHTENED below 3: the 4-band×8-bit
    pigeonhole guarantees completeness for ≤3 differing bits; a larger
    value would return an incomplete pair set silently.

    Same skew contract as minhash_band_pairs: ``max_bucket_members``
    drops over-full band buckets (their members are near-identical
    fingerprints a dedup_exact pass collapses upstream); uncapped mode
    carries the in-plan MAX_POSTING_LIST valve instead — a hot bucket
    raises before the k² pair explosion runs.

    Same bucket-then-pair shape as dedup_minhash: explode each doc to
    its 4 bands, one shuffle on (band, bits), pairs generated inside
    each bucket — no self-join. ``rotate_bits`` rotates the 32-bit
    fingerprint before banding: rotation permutes bits, so Hamming
    distance is invariant and the pigeonhole guarantee (≤3 differing
    bits leave ≥1 of 4 bands intact) holds for ANY rotation — which is
    what lets dedup_simhash_crosscheck run a second, independent
    pigeonhole partition against the first."""
    if max_hamming > 3:
        raise ValueError("max_hamming > 3 voids the 4-band pigeonhole guarantee")
    fp = F.col("simhash")
    if rotate_bits:
        fp = (
            F.shiftright("simhash", rotate_bits)
            .bitwiseOR(F.shiftleft("simhash", 32 - rotate_bits))
            .bitwiseAND(F.lit(0xFFFFFFFF))
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(fp, b * 8).bitwiseAND(F.lit(255)).alias("bits"),
            )
            for b in range(4)
        ]
    )
    banded = sigs.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
        "doc_id", "simhash", "b.band", "b.bits"
    )
    buckets = (
        banded.groupBy("band", "bits")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_bucket_members is None:
        buckets = guard_posting_buckets(
            buckets, F.size("members"), "simhash_pairs"
        )
    else:
        buckets = buckets.filter(F.size("members") <= max_bucket_members)
    # Hamming cut fused INTO the pair expansion (r16, guide §5): the
    # r15 form materialized the full k(k-1)/2 struct-pair array per
    # bucket row BEFORE the cut — at sf0.1 that is 2.7 M allocated
    # structs (the hottest bucket alone 352 k in one task's single
    # flatten) thrown away down to the O(near-dup) survivors. Filtering
    # j by bit_count at the index level keeps the k²/2 iteration but
    # allocates only passing pairs — same pair set by construction (the
    # cut moved from a post-explode filter to the generator, both
    # bit_count(xor) <= max_hamming on the same operands). The cut
    # still runs BEFORE the multi-band dedup, so only near-dup pairs
    # reach the dropDuplicates shuffle (r10 verdict item 7).
    pair_structs = F.expr(
        f"""
        flatten(transform(sequence(0, size(members) - 2), i ->
            transform(
                filter(sequence(i + 1, size(members) - 1), j ->
                    bit_count(members[i].simhash ^ members[j].simhash)
                        <= {int(max_hamming)}),
                j -> struct(members[i] AS a, members[j] AS b))))
        """
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.a.doc_id").alias("id_a"),
            F.col("p.b.doc_id").alias("id_b"),
            F.col("p.a.simhash").alias("sim_a"),
            F.col("p.b.simhash").alias("sim_b"),
        )
        .withColumn("hamming", hamming)
        .dropDuplicates(["id_a", "id_b"])  # collapse multi-band collisions
        .select("id_a", "id_b", "hamming")
    )


@register(
    "dedup_simhash_crosscheck",
    oracle="SELECT CAST(0 AS BIGINT) AS only_in_primary, CAST(0 AS BIGINT) AS only_in_rotated",
    doc="L2c-err (round 7): driver-hashed completeness cross-check for "
        "dedup_simhash — the SAME Hamming-≤3 pair set must come out of "
        "two INDEPENDENT pigeonhole partitions (the primary 4×8 banding "
        "and a 4-bit-rotated banding; rotation preserves Hamming "
        "distance, so both are complete by pigeonhole). A banding bug "
        "that drops pairs would have to drop exactly the same pairs "
        "under both partitions to stay green. Cost: 2× the banding "
        "scan, pair sets are O(near-dups). The exact brute-force proof "
        "stays in pytest at small sf; this key extends banding evidence "
        "to every driver sf.",
)
def dedup_simhash_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Both bandings consume the same signature frame; checkpoint it
    # once (O(docs) rows of two longs — the text_bm25 / graph_pagerank
    # pattern) or Catalyst re-derives the corpus scan + 32-lane bit
    # vote per banding (r16; the signature build dominated this key's
    # wall, so the second derivation was a straight 2×).
    sigs = simhash_signatures(docs).localCheckpoint(eager=True)
    a = simhash_pairs(sigs).select("id_a", "id_b")
    b = simhash_pairs(sigs, rotate_bits=4).select("id_a", "id_b")
    # Symmetric difference in ONE pass: tag-union + per-pair side
    # counts + one aggregate. The two-anti-join formulation evaluated
    # each banding TWICE (once per anti join — 4 pair generations) and
    # shuffled the pair sets twice; this is 2 generations and one
    # (id_a, id_b) shuffle (r10 verdict item 7; sf1: 147s → 25s).
    tagged = a.withColumn("__s", F.lit(0)).unionByName(
        b.withColumn("__s", F.lit(1))
    )
    per_pair = tagged.groupBy("id_a", "id_b").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("in_a"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("in_b"),
    )
    return per_pair.agg(
        F.count(F.when(F.col("in_b") == 0, 1)).cast("bigint").alias("only_in_primary"),
        F.count(F.when(F.col("in_a") == 0, 1)).cast("bigint").alias("only_in_rotated"),
    )


@register(
    "dedup_clusters",
    oracle=_CLUSTER_SQL + """
    SELECT doc_id, cluster_id FROM lab
    """,
    doc="L2d: near-dup clusters — connected components over the n-gram "
        "Jaccard pair graph, scale-adaptive: the thresholded pair set is "
        "O(near-dup pairs), orders of magnitude smaller than the corpus, "
        "so when it fits the driver comfortably (<= _EDGE_DRIVER_LIMIT "
        "edges) a driver-side union-find labels it in one collect — no "
        "iterative jobs at all. Past the limit, distributed min-label "
        "propagation WITH pointer doubling (label ← min(label, "
        "label[label]) each round, so chains halve and convergence is "
        "O(log diameter)); one action per round, pair graph checkpointed "
        "once, labels O(clustered docs). Same fixpoint either way — the "
        "pytest suite forces both paths. Oracle: DuckDB recursive CTE "
        "transitive closure.",
)
def dedup_clusters(
    spark: SparkSession, sf_dir: str, edge_driver_limit: int | None = None
) -> DataFrame:
    # Label memo: the propagation loop is iterative (several blocking
    # Spark jobs), and dedup_survivors composes on top of it — without a
    # memo the whole loop runs twice per sweep. The final labels are
    # O(clustered docs) — tiny by the near-dup-pair construction — so
    # caching the collected rows per (application, sf_dir) is driver-safe
    # and turns the second call into a createDataFrame. (Deterministic
    # output: min-label propagation has a unique fixpoint.)
    # The memo assumes immutable fixtures under sf_dir for the lifetime
    # of the application (true for the driver's read-only test data).
    # Bypass it entirely when a caller forces edge_driver_limit: the
    # cache is path-agnostic, so a forced-path call must not read (or
    # poison) the default path's entry.
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    if edge_driver_limit is None:
        cached = _CLUSTER_LABEL_CACHE.get(cache_key)
        if cached is not None:
            return spark.createDataFrame(cached, "doc_id bigint, cluster_id bigint")
    limit = _EDGE_DRIVER_LIMIT if edge_driver_limit is None else edge_driver_limit
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    # Scale-adaptive: count the (deduplicated, thresholded) pair set
    # first. It is NOT corpus-sized — it is the near-dup pair list — so
    # the common case collects onto the driver and union-finds in
    # microseconds instead of running a multi-job distributed loop.
    # limit+1 bounds the driver transfer before deciding.
    head = [(r.id_a, r.id_b) for r in pairs.limit(limit + 1).collect()]
    if len(head) <= limit:
        labels_local = driver_union_find(head)
        if edge_driver_limit is None:
            _CLUSTER_LABEL_CACHE[cache_key] = labels_local
        return spark.createDataFrame(labels_local, "doc_id bigint, cluster_id bigint")
    result = propagate_min_labels(pairs).toDF("doc_id", "cluster_id")
    # This branch exists precisely because the edge list outgrew the
    # driver — labels can be up to 2x edges nodes, so collecting them for
    # the memo would reintroduce the OOM the branch avoids.  `labels` is
    # already localCheckpointed (materialized on executors), so returning
    # the frame lazily is free; memoize only when the label count is
    # verified driver-sized.
    n_labels = result.count()
    if edge_driver_limit is None and n_labels <= _EDGE_DRIVER_LIMIT:
        _CLUSTER_LABEL_CACHE[cache_key] = [
            (r.doc_id, r.cluster_id) for r in result.collect()
        ]
        return spark.createDataFrame(
            _CLUSTER_LABEL_CACHE[cache_key], "doc_id bigint, cluster_id bigint"
        )
    return result


@register(
    "dedup_survivors",
    oracle=_CLUSTER_SQL + """
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    LEFT JOIN lab ON lab.doc_id = d.doc_id
    WHERE lab.doc_id IS NULL OR lab.cluster_id = d.doc_id
    """,
    doc="L2e: near-dup REMOVAL — the corpus with every non-minimum member "
        "of each Jaccard cluster dropped (keep one representative per "
        "cluster, plus all unclustered docs). The funnel stage downstream "
        "of dedup_clusters: labels are O(clustered docs) — tiny next to "
        "the corpus — so the removal is a left-anti join against just the "
        "losers, never a shuffle of the full corpus against itself.",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    losers = (
        dedup_clusters(spark, sf_dir)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id", "lang", "n_chars")


@register(
    "dedup_exact_hashkey",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) t WHERE rn = 1
    """,
    doc="L1b: the 100 TB variant dedup_exact's docstring promises, as a "
        "verified query: shuffle on xxhash64(text) — a fixed 8-byte key — "
        "instead of the full document text, then resolve (rare) hash "
        "collisions by grouping on the exact text WITHIN each hash bucket. "
        "Shuffle payload per row drops from O(doc bytes) to O(row minus "
        "text…) + 8 bytes of key; the oracle (same as dedup_exact) proves "
        "the rewrite is distribution-only. min_by picks the lowest-doc_id "
        "survivor in one pass — no window, map-side partial aggregates.",
)
def dedup_exact_hashkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.withColumn("_h", F.xxhash64("text"))
    # groupBy (_h, text): the hash prefixes the shuffle key so equal-hash
    # rows colocate; including text makes collisions harmless (two texts
    # with one hash form two groups in the same partition).
    return (
        h.groupBy("_h", "text")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "source", "n_chars"), F.col("doc_id")
            ).alias("s")
        )
        .select(
            F.col("s.doc_id").alias("doc_id"),
            "text",
            F.col("s.lang").alias("lang"),
            F.col("s.source").alias("source"),
            F.col("s.n_chars").alias("n_chars"),
        )
    )


LEV_MIN_SHARED = 2      # candidate gate: >= 2 shared shingles
LEV_PREFIX = 120        # verify on a fixed prefix — bounds cost per pair
LEV_MAX_DIST = 25       # absolute edit-distance threshold on the prefix


@register(
    "neardup_levenshtein",
    oracle=_PAIR_PREFIX + f"""
    SELECT id_a, id_b, inter,
           levenshtein(substr(da.text, 1, {LEV_PREFIX}),
                       substr(db.text, 1, {LEV_PREFIX})) AS edit_dist
    FROM raw_pairs
    JOIN documents da ON da.doc_id = id_a
    JOIN documents db ON db.doc_id = id_b
    WHERE inter >= {LEV_MIN_SHARED}
      AND levenshtein(substr(da.text, 1, {LEV_PREFIX}),
                      substr(db.text, 1, {LEV_PREFIX})) <= {LEV_MAX_DIST}
    """,
    doc="L2d: edit-distance near-dup pairs — the classic two-phase ER "
        "shape: CHEAP candidate generation (shingle inverted index, docs "
        "only meet if they share >= LEV_MIN_SHARED shingles — never "
        "all-pairs) then an EXPENSIVE verifier (Levenshtein) on the "
        "surviving pairs only, cost-bounded to a fixed text prefix. The "
        "pair table carries doc ids only; texts join in afterward keyed "
        "by doc_id, so the O(L^2) distance runs once per candidate, "
        "JVM-side (built-in levenshtein, no UDF).",
)
def neardup_levenshtein(
    spark: SparkSession, sf_dir: str, max_bucket_members: int | None = None
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs)
    # max-df cap (r11 ADVICE: the valve's remedy must be actionable at
    # every call site): ubiquitous shingles carry no near-dup signal,
    # and the shared-shingle gate stays exact over the filtered space.
    if max_bucket_members is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_bucket_members)
            .select("shingle")
        )
        sh = sh.join(bounded_broadcast(hot), "shingle", "left_anti")
    # same bucket-local pair emission as dedup_ngram_jaccard, minus the
    # set-size window (jaccard not needed — inter count is the gate)
    buckets = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket_members is None:
        buckets = guard_posting_buckets(
            buckets, F.size("ids"), "neardup_levenshtein"
        )
    pair_structs = F.expr(
        """
        flatten(transform(sequence(0, size(ids) - 2), i ->
            transform(sequence(i + 1, size(ids) - 1), j ->
                struct(ids[i] AS id_a, ids[j] AS id_b))))
        """
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(F.col("inter") >= LEV_MIN_SHARED)
    )
    pre = F.substring(F.col("text"), 1, LEV_PREFIX)
    ta = docs.select(F.col("doc_id").alias("id_a"), pre.alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"), pre.alias("_tb"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("edit_dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("edit_dist") <= LEV_MAX_DIST)
        .select("id_a", "id_b", "inter", "edit_dist")
    )


CONTAIN_THRESHOLD = 0.5  # same level as JACCARD_THRESHOLD → superset relation holds


@register(
    "dedup_containment",
    oracle=_PAIR_PREFIX + f"""
    SELECT id_a, id_b, inter, n_a, n_b,
           ROUND(CAST(inter AS DOUBLE) / LEAST(n_a, n_b), 6) AS containment
    FROM scored_pairs
    WHERE CAST(inter AS DOUBLE) / LEAST(n_a, n_b) >= {CONTAIN_THRESHOLD}
    """,
    doc="L2g: containment (partial-copy) near-dup pairs — score = "
        "|A∩B| / min(|A|,|B|), the asymmetric measure that catches a "
        "short document quoted wholesale inside a long one, which "
        "symmetric Jaccard structurally misses (the union term washes "
        "the overlap out). Same inverted-index bucket pairing and skew "
        "envelope as dedup_ngram_jaccard — one pass, no self-join; "
        "containment >= jaccard always, so at an equal threshold this "
        "pair set is a superset of the Jaccard set (pytest-pinned). "
        "The standard LLM-corpus companion pass: cross-doc quote/"
        "boilerplate removal after whole-doc dedup.",
)
def dedup_containment(
    spark: SparkSession, sf_dir: str, max_bucket_members: int | None = None
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs)
    # max-df cap (r11 ADVICE): same semantics as jaccard_pairs — drop
    # stopword-like shingles BEFORE set sizes, so containment stays
    # exact over the filtered shingle space.
    if max_bucket_members is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_bucket_members)
            .select("shingle")
        )
        sh = sh.join(bounded_broadcast(hot), "shingle", "left_anti")
    sh = sh.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    buckets = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("members"))
        .filter(F.size("members") > 1)
    )
    if max_bucket_members is None:
        buckets = guard_posting_buckets(
            buckets, F.size("members"), "dedup_containment"
        )
    pair_structs = F.expr(
        """
        flatten(transform(sequence(0, size(members) - 2), i ->
            transform(sequence(i + 1, size(members) - 1), j ->
                struct(members[i] AS a, members[j] AS b))))
        """
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("id_a"),
            F.col("p.b.doc_id").alias("id_b"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cont = F.col("inter").cast("double") / F.least("n_a", "n_b")
    return (
        pairs.select("id_a", "id_b", "inter", "n_a", "n_b")
        .withColumn("containment", F.round(cont, 6))
        .filter(cont >= CONTAIN_THRESHOLD)
    )


SPAN_K = 3  # span length for the duplicated-n-gram inventory
SPAN_MIN_DOCS = 2


@register(
    "dedup_span_ngrams",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS tok FROM documents),
             LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(tok) - {SPAN_K - 1})) AS i)
    )
    SELECT gram,
           COUNT(DISTINCT doc_id) AS ndocs,
           COUNT(*) AS occurrences
    FROM g
    GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) >= {SPAN_MIN_DOCS}
    """,
    doc="L2e: duplicated-span inventory — every token {SPAN_K}-gram that "
        "appears in 2+ documents, with document frequency and total "
        "occurrence count (the exact-substring census behind span-level "
        "training-data dedup, Lee et al. 2022 'Deduplicating Training "
        "Data Makes Language Models Better' — their suffix-array pass "
        "answers the same question; at n-gram granularity it is a pure "
        "aggregation). Positional grams (NOT per-doc distinct): "
        "occurrences counts repeats inside one document too, which is "
        "what a span-removal rewrite needs. Plan: the shingle fan-out "
        "map-side, then one exact count-distinct (Spark expands to the "
        "two-shuffle partial plan keyed on (gram, doc_id) then gram). "
        "At 100 TB the HAVING gate is pushed into the final agg, and the "
        "practical variants bound output by min-df > 2 or top-k by "
        "occurrences; memory per reducer is O(1) either way.",
)
def dedup_span_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = spread_fanout(docs, "doc_id").withColumn(
        "_toks", F.split(F.col("text"), " ")
    )
    k = SPAN_K
    grams = F.when(
        F.size("_toks") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, k)),
        ),
    ).otherwise(F.array())
    return (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("ndocs"),
            F.count(F.lit(1)).alias("occurrences"),
        )
        .filter(F.col("ndocs") >= SPAN_MIN_DOCS)
    )


# ---------------------------------------------------------------------------
# MinHash error-envelope twins (round-7): dedup_minhash's output is
# hash-incomparable to an exact engine (the estimates depend on xxhash64
# bit mixing), but both legs of its CONTRACT are:
#   precision — a pair whose signatures agree strongly really is a
#     near-dup (exact Jaccard over the threshold);
#   recall — every genuinely near-identical pair is emitted as a
#     candidate.
# Each leg is SQL-checkable against the exact shingle graph, so each
# gets a driver-hashed key. Everything here is deterministic for a given
# corpus (xxhash64 signatures), so the flags are stable across runs.
# ---------------------------------------------------------------------------

# Signature-agreement level at which the precision claim is asserted:
# est ≥ 0.75 = ≥24/32 minhashes agree. Measured fixture margin: every
# such candidate has exact Jaccard ≥ 0.889 at sf0.01 / sf0.1 vs the
# 0.5 floor asserted.
MINHASH_PRECISION_EST = 0.75
# Recall leg asserted at exact Jaccard ≥ 0.9: P(missed by 8×4 banding)
# = (1 - 0.9^4)^8 ≈ 2e-4 per pair — and the fixture outcome is
# deterministic (24/24 found at sf0.01, 247/247 at sf0.1).
MINHASH_RECALL_JACCARD = 0.9


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sh array<string>) — exact shingle set per doc, for
    re-scoring a SMALL pair frame. Only ever joined against candidate
    pairs (O(near-dups), not O(corpus²))."""
    return shingles_df(docs).groupBy("doc_id").agg(F.collect_set("shingle").alias("sh"))


@register(
    "dedup_minhash_precision",
    oracle="SELECT CAST(0 AS BIGINT) AS n_violations",
    doc="L2b-err (precision leg): every dedup_minhash candidate whose "
        f"estimated Jaccard is ≥ {MINHASH_PRECISION_EST} (≥24/32 "
        "signature agreement) must have exact shingle Jaccard ≥ "
        f"{JACCARD_THRESHOLD}. Exact re-score touches only the emitted "
        "pairs — two joins against the per-doc shingle sets, O(candidate "
        "pairs) work. The oracle asserts zero violations; a broken "
        "signature family (e.g. correlated hashes) surfaces as a "
        "nonzero count → driver hash red.",
)
def dedup_minhash_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = (
        dedup_minhash(spark, sf_dir)
        .filter(F.col("est_jaccard") >= MINHASH_PRECISION_EST)
        .select("id_a", "id_b")
    )
    sets = _shingle_sets(docs)
    scored = (
        cand.join(sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select(
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / (
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect("sh_a", "sh_b"))
                )
            ).alias("exact_jac")
        )
    )
    return scored.agg(
        F.coalesce(
            F.sum(F.when(F.col("exact_jac") < JACCARD_THRESHOLD, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_violations")
    )


@register(
    "dedup_minhash_recall_pairs",
    oracle=_PAIR_PREFIX + f"""
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard, TRUE AS found
    FROM scored_pairs WHERE ROUND(jac, 6) >= {MINHASH_RECALL_JACCARD}
    """,
    doc="L2b-err (recall leg): every exact pair with shingle Jaccard ≥ "
        f"{MINHASH_RECALL_JACCARD} appears among dedup_minhash's "
        "candidates. The oracle recomputes the exact high-similarity "
        "pair set from the shingle graph and asserts found=TRUE per "
        "pair — a missed pair flips its row to FALSE and the hash goes "
        "red. (The pytest recall floor covers the broader ≥0.5 band "
        "where banding is probabilistic by design.)",
)
def dedup_minhash_recall_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exact = jaccard_pairs(docs).filter(
        F.col("jaccard") >= MINHASH_RECALL_JACCARD
    )
    cand = dedup_minhash(spark, sf_dir).select(
        "id_a", "id_b", F.lit(True).alias("_hit")
    )
    return exact.join(cand, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        "jaccard",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("found"),
    )


# ---------------------------------------------------------------------------
# Incremental dedup (round 7) — the PRODUCTION shape: a daily batch is
# deduped AGAINST the already-curated historical corpus, not by
# re-deduping the whole corpus. Fixture partition: doc_id % 5 == 0 is
# "today's batch" (20%), the rest is history. At 100 TB the history
# side is a STORED artifact (md5 fingerprint table / shingle inverted
# index, bucketed by its key) so each increment costs O(batch), never
# O(corpus): the exact probe is an anti-join against the fingerprint
# table; the near-dup probe joins batch shingles to the stored posting
# lists, bounded by the same max-df cap as jaccard_pairs.
# ---------------------------------------------------------------------------

INCR_BATCH_MOD = 5


@register(
    "dedup_incremental_exact",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents WHERE doc_id % {INCR_BATCH_MOD} = 0
    ) b
    WHERE rn = 1
      AND NOT EXISTS (
          SELECT 1 FROM documents h
          WHERE h.doc_id % {INCR_BATCH_MOD} <> 0 AND h.text = b.text
      )
    """,
    doc="L1b: incremental exact dedup — batch survivors are docs that "
        "are first-of-their-content WITHIN the batch (min doc_id) AND "
        "whose md5 fingerprint is absent from the historical corpus's "
        "fingerprint table. The history side reduces to a 16-byte-key "
        "anti-join against a stored, bucketed fingerprint table — the "
        "batch never touches historical text. Oracle phrases the same "
        "predicate via text equality (md5 is content identity here).",
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
    hist_fp = (
        docs.filter(F.col("doc_id") % INCR_BATCH_MOD != 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    batch_first = (
        batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("fp", F.md5("text"))
    )
    return batch_first.join(hist_fp, "fp", "left_anti").select(
        "doc_id", "source", "n_chars"
    )


@register(
    "dedup_incremental_jaccard",
    oracle=_PAIR_PREFIX + f"""
    , cross_pairs AS (
        SELECT CASE WHEN id_a % {INCR_BATCH_MOD} = 0 THEN id_a ELSE id_b END AS batch_id,
               jac
        FROM scored_pairs
        WHERE (id_a % {INCR_BATCH_MOD} = 0) <> (id_b % {INCR_BATCH_MOD} = 0)
          AND jac >= {JACCARD_THRESHOLD}
    )
    SELECT batch_id AS doc_id, ROUND(MAX(jac), 6) AS max_hist_jaccard
    FROM cross_pairs GROUP BY batch_id
    """,
    doc="L2e: incremental near-dup probe — for each batch doc, its max "
        "exact shingle Jaccard against the HISTORICAL corpus (only "
        f"pairs ≥ {JACCARD_THRESHOLD} reported; these are the docs an "
        "incremental curation run drops). Pairing emits ONLY "
        "history×batch pairs from each posting list — batch×batch and "
        "history×history pairs are never materialized, so the "
        "increment's pair volume is O(batch near-dups), and the "
        "history side is exactly the stored inverted index "
        "dedup_ngram_jaccard's scale story describes. Same max-df skew "
        "cap applies (max_bucket_members).",
)
def dedup_incremental_jaccard(
    spark: SparkSession, sf_dir: str, max_bucket_members: int | None = None
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs)
    if max_bucket_members is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_bucket_members)
            .select("shingle")
        )
        sh = sh.join(bounded_broadcast(hot), "shingle", "left_anti")
    sh = sh.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    sh = sh.withColumn("is_batch", F.col("doc_id") % INCR_BATCH_MOD == 0)
    # Per shingle: the two sides' posting lists, pairs emitted ONLY
    # across sides (history member x batch member) — the incremental
    # analogue of jaccard_pairs' bucket-local emission.
    buckets = (
        sh.groupBy("shingle")
        .agg(
            F.collect_list(
                F.when(~F.col("is_batch"), F.struct("doc_id", "n"))
            ).alias("hist"),
            F.collect_list(
                F.when(F.col("is_batch"), F.struct("doc_id", "n"))
            ).alias("batch"),
        )
        .filter((F.size("hist") > 0) & (F.size("batch") > 0))
    )
    if max_bucket_members is None:
        # hist×batch emission per bucket — bound the PRODUCT against
        # the same single-task pair budget the k(k-1)/2 emitters get
        # (a per-side greatest() cap would admit a 2× burst at
        # hist = batch = MAX_POSTING_LIST).
        buckets = guard_posting_buckets(
            buckets,
            F.size("hist") * F.size("batch"),
            "dedup_incremental_jaccard",
            pair_budget=True,
        )
    pair_structs = F.expr(
        """
        flatten(transform(hist, h -> transform(batch, b ->
            struct(h AS h, b AS b))))
        """
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.b.doc_id").alias("doc_id"),
            F.col("p.h.doc_id").alias("hist_id"),
            F.col("p.b.n").alias("n_b"),
            F.col("p.h.n").alias("n_h"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("n_b") + F.col("n_h") - F.col("inter"))
    return (
        pairs.withColumn("jac", jac)
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
        .groupBy("doc_id")
        .agg(F.round(F.max("jac"), 6).alias("max_hist_jaccard"))
    )


SPAN_REMOVE_DF = 4  # a span this ubiquitous is boilerplate — cut it


@register(
    "dedup_span_removal",
    oracle=f"""
    WITH tokd AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS tok FROM documents
    ), g AS (
        SELECT doc_id, i, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        FROM tokd,
             LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(tok) - {SPAN_K - 1})) AS i)
    ), hot AS (
        SELECT gram FROM g GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= {SPAN_REMOVE_DF}
    ), covered AS (
        SELECT DISTINCT doc_id, i + d AS pos
        FROM g, LATERAL (SELECT UNNEST([0, 1, 2]) AS d)
        WHERE gram IN (SELECT gram FROM hot)
    ), toks AS (
        SELECT doc_id, i AS pos, tok[i] AS t
        FROM tokd, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(tok))) AS i)
    )
    SELECT t.doc_id,
           COALESCE(STRING_AGG(t.t, ' ' ORDER BY t.pos)
                    FILTER (WHERE c.pos IS NULL), '') AS clean_text,
           CAST(COUNT(c.pos) AS INTEGER) AS n_removed
    FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
    GROUP BY t.doc_id
    """,
    doc="L2f: span-level dedup REMOVAL — the rewrite the "
        "dedup_span_ngrams inventory exists for (Lee et al. 2022 cut "
        "duplicated substrings out of the training text rather than "
        "dropping whole docs): every token covered by a "
        f"{SPAN_K}-gram occurring in ≥ {SPAN_REMOVE_DF} documents "
        "(boilerplate by ubiquity) is deleted, the remaining tokens are "
        "rejoined, and the per-doc removed-token count is reported. "
        "Single-pass semantics (tokens flanking a cut become adjacent "
        "and can FORM a new duplicated span — the standard Lee et al. "
        "caveat); run to fixpoint where that matters. "
        "Plan: the hot-span set is a HAVING-gated aggregate (tiny by "
        "construction — spans in 4+ docs), broadcast into a semi-join "
        "against the positional gram stream; covered start positions "
        "aggregate per doc (one doc_id shuffle) and the actual edit is "
        "pure codegen array surgery (position expansion, indexed "
        "filter, concat) — the document text itself never shuffles. "
        "O(tokens) end to end.",
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r16: spread before the double gram fan-out (shingles_df's
    # rationale — both explodes below otherwise serialize on the
    # one-split local scan; no-op at scale via spread_fanout).
    toked = spread_fanout(docs, "doc_id").select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    k = SPAN_K
    gram_starts = F.when(
        F.size("toks") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (k - 1)),
            lambda i: F.struct(
                i.alias("i"), F.concat_ws(" ", F.slice("toks", i, k)).alias("gram")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,gram:string>>"))
    g = toked.select("doc_id", F.explode(gram_starts).alias("g")).select(
        "doc_id", F.col("g.i").alias("i"), F.col("g.gram").alias("gram")
    )
    # Hot-span census via per-doc DISTINCT grams (r16, guide §2.2
    # "shuffle fewer bytes"): COUNT(DISTINCT doc_id) expands to the
    # two-exchange (gram, doc_id)-then-gram plan; deduping each doc's
    # grams row-locally first makes it a plain map-side-combined
    # count(*) — one exchange, same number by construction (each doc
    # contributes each of its grams exactly once either way). The
    # distinct-gram explode has a costly generator child, so
    # InferFiltersFromGenerate stays off (the shingles_df lesson).
    dgrams = F.when(
        F.size("toks") >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    hot = (
        toked.select(F.explode(dgrams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= SPAN_REMOVE_DF)
        .select("gram")
    )
    starts = (
        # hot is HAVING-gated and tiny on every fixture, but nothing
        # bounds it on a boilerplate-heavy corpus — bounded_broadcast
        # counts (capped) before hinting, falling back to a shuffle
        # semi-join past MAX_BROADCAST_KEYS.
        g.join(bounded_broadcast(hot), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("starts"))
    )
    edited = toked.join(starts, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        "starts", lambda s: F.sequence(s, s + F.lit(k - 1))
                    )
                )
            ),
            F.array().cast("array<int>"),
        ).alias("removed"),
    )
    kept = F.filter(
        "toks", lambda t, idx: ~F.array_contains("removed", idx + F.lit(1))
    )
    return edited.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size("removed").cast("int").alias("n_removed"),
    )
