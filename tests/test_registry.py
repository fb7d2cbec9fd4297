"""Registry hygiene: every fixture key must carry driver-checkable
evidence — an exact DuckDB oracle, or a documented rows-only rationale
(approximate/crypto operators whose output is inherently
non-deterministic across engines, each guarded by its own pytest).

The external driver sweeps at most 50 queries per round in queries()
order; registry._DRIVER_WINDOW pins which 50 go first. These tests keep
that contract from silently rotting (keys stranded outside every
window, window entries that don't exist, oracle-less keys with no
sanctioned reason).
"""

from hyperswitch_data_backfill_spark import registry

# SURVEY §5.2-sanctioned rows-only keys: approximate sketches (HLL, KLL,
# MinHash, SimHash, LSH/IVF ANN) — no exact cross-engine oracle exists BY
# DESIGN; each has pytest recall/round-trip guards
# (test_quality_guards.py) AND, since round 7, a driver-hashed
# error-envelope twin (*_err / *_recall_floor / *_precision keys) so the
# CLAIM each sketch makes is oracle-checked even though its raw output
# isn't. udf_decrypt left this list in round 7: its output (flags +
# lengths) was always oracle-predictable — upgraded in place.
SANCTIONED_ROWS_ONLY = {
    "agg_approx_distinct",   # HLL sketch — estimate, not exact
    "agg_hll_merge",         # Datasketches HLL partials — estimate; merge≡direct pytest
    "agg_approx_percentile", # KLL/GK sketch — rank-error bound only
    "dedup_minhash",         # probabilistic signatures; recall-guarded
    "dedup_simhash",         # probabilistic fingerprints; recall-guarded
    "sim_topk",              # LSH ANN — recall floor vs exact baseline
    "neardup_cosine_lsh",    # LSH-bucketed pair graph — recall floor vs
    #   the exact label-blocked pair set (neardup_cosine_recall_floor);
    #   precision is 1 by construction (exact re-score)
    "sim_ivf",               # IVF ANN — recall floor vs exact baseline
    "sim_ivf_trained",       # KMeans-trained IVF — recall floor
    "sim_ivfpq",             # IVF-PQ ANN — PQ-compressed ranking; recall floor
    "emb_pq_quantize",       # PQ codes = float argmin vs float codebook —
    #   not oracle-replayable; pytest pins code range, idempotence, and
    #   recon-MSE beating the rank-0 (global-mean) quantizer
    "decontam_bloom",        # Bloom FPs drop extra clean docs — output is
    #   hash-incomparable to an exact engine; pytest proves survivors are
    #   a subset of decontam_ngram's with zero false negatives
}


def test_every_key_has_oracle_or_sanctioned_rationale():
    registry._load_all_operator_modules()
    missing = {
        n
        for n, q in registry.REGISTRY.items()
        if q.oracle is None and n not in SANCTIONED_ROWS_ONLY
    }
    assert not missing, f"oracle-less keys without documented rationale: {sorted(missing)}"
    stale = SANCTIONED_ROWS_ONLY - set(registry.REGISTRY)
    assert not stale, f"sanctioned keys no longer registered: {sorted(stale)}"
    gained = {n for n in SANCTIONED_ROWS_ONLY if registry.REGISTRY[n].oracle is not None}
    assert not gained, f"keys gained oracles — drop from allowlist: {sorted(gained)}"


def test_driver_window_is_exactly_50_real_keys():
    registry._load_all_operator_modules()
    win = registry._DRIVER_WINDOW
    assert len(win) == 50
    assert len(set(win)) == 50, "duplicate keys in _DRIVER_WINDOW"
    unknown = set(win) - set(registry.REGISTRY)
    assert not unknown, f"window names not in registry: {sorted(unknown)}"


def test_driver_window_covers_every_unproven_key():
    """Zero-regression invariant, ALL keys: every registered key must be
    either (a) driver-recorded in a shipped CORRECTNESS_r0*.json —
    hash-green for oracle-backed keys, a completed rows-only record
    (err == 'no_oracle' with a row count) for sanctioned rows-only
    keys — or (b) in the current _DRIVER_WINDOW so this round's sweep
    will record it. Round-5 extension (r4 verdict item 1c): rows-only
    keys are covered too, so a key can never again ship with pytest-only
    verification (sim_ivfpq/agg_hll_merge slipped through the
    oracle-only version of this test in round 4)."""
    import json

    registry._load_all_operator_modules()
    proven: set[str] = set()
    for _rnd, f in _rotation().correctness_files():
        for key, row in json.loads(f.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                proven.add(key)  # oracle-backed green
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                proven.add(key)  # completed rows-only record
    uncovered = set(registry.REGISTRY) - proven - set(registry._DRIVER_WINDOW)
    assert not uncovered, (
        f"keys with no driver record AND no window slot: "
        f"{sorted(uncovered)} — add them to _DRIVER_WINDOW"
    )


def _rotation():
    """Load tools/rotation.py as a module (tools/ is not a package)."""
    import importlib.util
    from pathlib import Path

    p = Path(__file__).resolve().parent.parent / "tools" / "rotation.py"
    spec = importlib.util.spec_from_file_location("rotation_under_test", p)
    rotation = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rotation)
    return rotation


def test_driver_window_matches_rotation_output():
    """The committed _DRIVER_WINDOW must BE the mechanical rotation
    (r8 verdict item 2: the r7→r8 hand-listed window let a written-down
    rotation go unexecuted for two rounds — CORRECTNESS_r08 re-swept
    r07's exact key set while the r4-vintage tail aged). Since round 13
    the evidence pin DERIVES from the newest shipped artifact (r12
    verdict wrong-item 1: the hand-bumped literal was a recurring
    chore), so the committed window must equal the suggestion at the
    derived pin OR at pin-1 — the latter covers the driver dropping
    CORRECTNESS_r{N+1}.json after the builder's snapshot (r9 verdict
    item 1). A window matching NEITHER is genuinely stale: a full
    builder round went by without executing the rotation."""
    rotation = _rotation()
    pin = registry._WINDOW_EVIDENCE_ROUND
    candidates = {
        rnd: rotation.suggested_window(
            50, prepend=registry._WINDOW_PREPEND, max_round=rnd
        )
        for rnd in (pin, pin - 1)
    }
    assert any(registry._DRIVER_WINDOW == w for w in candidates.values()), (
        "committed _DRIVER_WINDOW matches the rotation output at neither "
        f"the derived evidence pin (r{pin}) nor r{pin - 1} (post-snapshot "
        "tolerance) — the rotation was not executed last round; run "
        "`python tools/rotation.py` and paste the suggested window "
        "(prepend hook: registry._WINDOW_PREPEND)"
    )


def test_window_evidence_pin_derivation():
    """The derived pin must equal the newest shipped CORRECTNESS round
    as tools/rotation parses them — guards the two scanners (registry's
    and rotation's, which can't share code without an import cycle)
    from drifting apart."""
    rotation = _rotation()
    rounds = [rnd for rnd, _f in rotation.correctness_files()]
    assert rounds, "no CORRECTNESS_r*.json artifacts found"
    assert registry._WINDOW_EVIDENCE_ROUND == max(rounds), (
        f"registry derived pin r{registry._WINDOW_EVIDENCE_ROUND} != newest "
        f"shipped artifact r{max(rounds)} — _shipped_evidence_rounds() has "
        "drifted from tools/rotation.correctness_files()"
    )


def test_rotation_detects_genuinely_stale_window():
    """Regression case demanded by the r9 verdict: the hardened tripwire
    must still FAIL on a window that is genuinely stale. A window left
    over from TWO rotations ago (suggestion at pin-2) must match neither
    of the suggestions the match test accepts (pin, pin-1), i.e. a
    builder who skipped a full round of rotation is caught."""
    rotation = _rotation()
    pin = registry._WINDOW_EVIDENCE_ROUND
    stale = rotation.suggested_window(
        50, prepend=registry._WINDOW_PREPEND, max_round=pin - 2
    )
    accepted = [
        rotation.suggested_window(
            50, prepend=registry._WINDOW_PREPEND, max_round=rnd
        )
        for rnd in (pin, pin - 1)
    ]
    assert stale not in accepted, (
        "rotation output from two pins ago would still pass the match "
        "test — the staleness tripwire has lost its teeth (did the "
        "driver sweeps change nothing for two rounds?)"
    )


def test_rotation_skips_non_artifact_files(tmp_path, monkeypatch):
    """correctness_files must skip (not crash on) names like
    CORRECTNESS_r09_backup.json and must order r10 after r9 numerically
    (round-9 ADVICE: int(f.stem[...]) raised ValueError on non-matching
    names and a lexical sort put r10 between r1 and r2)."""
    import json as _json

    rotation = _rotation()
    for name, payload in [
        ("CORRECTNESS_r2.json", {}),
        ("CORRECTNESS_r9.json", {}),
        ("CORRECTNESS_r10.json", {}),
        ("CORRECTNESS_r09_backup.json", {}),
        ("CORRECTNESS_rerun.json", {}),
    ]:
        (tmp_path / name).write_text(_json.dumps(payload))
    monkeypatch.setattr(rotation, "_REPO_ROOT", tmp_path)
    got = rotation.correctness_files()
    assert [rnd for rnd, _f in got] == [2, 9, 10]
    assert [rnd for rnd, _f in rotation.correctness_files(max_round=9)] == [2, 9]


def test_queries_yield_window_first_then_all():
    qs = registry.queries()
    names = list(qs)
    assert names[:50] == [n for n in registry._DRIVER_WINDOW if n in registry.REGISTRY]
    assert set(names) == set(registry.REGISTRY), "queries() must expose every key"
    oracles = registry.oracle_sql()
    assert set(oracles) == {
        n for n, q in registry.REGISTRY.items() if q.oracle is not None
    }


def test_every_oracle_is_driver_canon_safe(duck):
    """No oracle may yield nested-typed (list/struct/map) result columns:
    the external driver canonicalizes by pandas-sorting the frame, and
    nested cells are unhashable there — pgwire_scan_embeddings shipped
    r14 with a FLOAT[] column and went red at its only driver record
    while both local mirrors (tuple-normalizing) called it green (r14
    verdict item 2). DuckDB planning is enough to get the types, so this
    sweeps all ~175 oracles in seconds."""
    registry._load_all_operator_modules()
    bad = {}
    for name, q in registry.REGISTRY.items():
        if q.oracle is None:
            continue
        rel = duck.sql(q.oracle)
        nested = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if any(tok in str(t) for tok in
               ("[]", "STRUCT", "MAP", "LIST", "BLOB"))
        ]
        if nested:
            bad[name] = nested
    assert not bad, (
        f"oracles with nested-typed output columns (driver canon would "
        f"crash on the matching Spark result): {bad} — project to "
        f"scalars (unnest/posexplode or array_to_string) on BOTH sides"
    )


def test_driver_canon_guard_flags_nested_columns(spark):
    """The shared guard both local mirrors call must flag exactly the
    column shapes the driver's canonicalizer rejects — including the
    array<float> shape that produced the r14 red row."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        "id",
        F.array(F.lit(1.0), F.lit(2.0)).cast("array<float>").alias("emb"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("a")).alias("s"),
        F.lit(b"\x00").alias("raw"),
        F.lit("x").alias("ok"),
    )
    assert registry.driver_canon_unsafe_columns(df.schema) == [
        "emb", "m", "s", "raw"]
    assert registry.driver_canon_unsafe_columns(
        spark.range(1).schema) == []


def test_inventory_doc_in_sync():
    """INVENTORY.md is generated from the registry (tools/inventory.py);
    a key registered without regenerating it fails here."""
    from pathlib import Path

    registry._load_all_operator_modules()
    text = (Path(__file__).resolve().parent.parent / "INVENTORY.md").read_text()
    missing = [n for n in registry.REGISTRY if f"| `{n}` |" not in text]
    assert not missing, f"regenerate INVENTORY.md (python tools/inventory.py): {missing}"
