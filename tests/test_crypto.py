"""U1/U4 unit tests: keystream cipher round-trip, key derivation,
broadcast-key decrypt path with per-row quarantine (the reference
fail-fasts the whole batch instead — payment_intent.rs:108-112)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hyperswitch_data_backfill_spark.functions.crypto import (
    HAVE_AES,
    decrypt_with_broadcast_keys,
    derive_key,
    xor_cipher,
    xor_transform_udf,
)


def test_xor_roundtrip_bytes():
    key = derive_key("merchant-1")
    for payload in [b"", b"x", b"hello world" * 100, bytes(range(256))]:
        assert xor_cipher(xor_cipher(payload, key), key) == payload


def test_derive_key_deterministic_and_distinct():
    assert derive_key("a") == derive_key("a")
    assert derive_key("a") != derive_key("b")
    assert derive_key("a", b"other-master") != derive_key("a")
    assert len(derive_key("a")) == 32


def test_decrypt_quarantine_on_missing_key(spark):
    fact = spark.createDataFrame(
        [(1, "m1", bytes(xor_cipher(b"secret-1", derive_key("m1")))),
         (2, "m2", bytes(xor_cipher(b"secret-2", derive_key("m2")))),
         (3, "m-unknown", b"\x00\x01\x02")],
        "id long, merchant_id string, ciphertext binary",
    )
    keys = spark.createDataFrame(
        [("m1", derive_key("m1")), ("m2", derive_key("m2"))],
        "merchant_id string, data_key binary",
    )
    out = decrypt_with_broadcast_keys(fact, keys, "merchant_id", "ciphertext")
    rows = {r["id"]: r for r in out.collect()}
    assert bytes(rows[1]["decrypted"]) == b"secret-1"
    assert bytes(rows[2]["decrypted"]) == b"secret-2"
    assert rows[3]["decrypted"] is None and rows[3]["decrypt_ok"] is False
    # the poison row did NOT abort the job — rows 1..2 still decrypted
    assert rows[1]["decrypt_ok"] and rows[2]["decrypt_ok"]


def test_vectorized_udf_batches(spark):
    n = 1000
    key = derive_key("bulk")
    df = spark.createDataFrame(
        [(i, xor_cipher(f"payload-{i}".encode(), key)) for i in range(n)],
        "id long, ct binary",
    ).withColumn("k", F.lit(bytearray(key)))
    dec = df.select("id", xor_transform_udf(F.col("ct"), F.col("k")).alias("pt"))
    rows = dec.collect()
    assert len(rows) == n
    assert all(bytes(r["pt"]) == f"payload-{r['id']}".encode() for r in rows)


def test_aes_available_flag():
    # container ships without `cryptography` — the engine must degrade
    # to the demo cipher, not crash at import
    assert HAVE_AES in (True, False)


# --- property-based guards (hypothesis): the cipher and the encrypted
# config value format must round-trip for ARBITRARY payloads/keys, not
# just the hand-picked examples above.

from hypothesis import given, settings, strategies as st


@settings(max_examples=50, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=4096),
    key=st.binary(min_size=1, max_size=64),
)
def test_xor_cipher_roundtrips_any_payload_any_key(payload, key):
    assert xor_cipher(xor_cipher(payload, key), key) == payload


@settings(max_examples=50, deadline=None)
@given(
    secret=st.text(min_size=0, max_size=512),
    key32=st.binary(min_size=32, max_size=32),
    nonce=st.binary(min_size=12, max_size=12),
)
def test_encrypted_config_value_roundtrips_any_secret(secret, key32, nonce):
    from hyperswitch_data_backfill_spark.config import (
        encrypt_secret_value,
        encrypted_value_resolver,
    )

    enc = encrypt_secret_value(secret, key32, nonce=nonce)
    assert enc.startswith("enc:")
    resolve = encrypted_value_resolver(key32)
    assert resolve("s", "password", enc) == secret
    # non-encrypted values pass through untouched — even ones that look
    # almost like ciphertext
    assert resolve("s", "password", "enc") == "enc"
    assert resolve("s", "password", secret.replace("enc:", "")) == secret.replace("enc:", "")


@settings(max_examples=20, deadline=None)
@given(key32=st.binary(min_size=32, max_size=32))
def test_encrypted_config_value_rejects_wrong_key(key32):
    import pytest

    from hyperswitch_data_backfill_spark.config import (
        encrypt_secret_value,
        encrypted_value_resolver,
    )

    if not HAVE_AES:
        pytest.skip("authenticated rejection needs AES-GCM")
    enc = encrypt_secret_value("top-secret", key32)
    wrong = bytes(b ^ 0xFF for b in key32)
    with pytest.raises(ValueError, match="decryption failed"):
        encrypted_value_resolver(wrong)("s", "password", enc)


def test_enc_value_records_cipher_scheme():
    """The scheme chosen at encrypt time is embedded in the value —
    decrypt dispatches on the RECORDED scheme, never on the local
    HAVE_AES flag, so a blob moved between differently-provisioned
    hosts can't be mis-decrypted into garbage."""
    from hyperswitch_data_backfill_spark.config import (
        encrypt_secret_value,
        encrypted_value_resolver,
    )

    key = bytes(range(32))
    xor_blob = encrypt_secret_value("s3cret", key, scheme="xor")
    assert xor_blob.startswith("enc:xor:")
    assert encrypted_value_resolver(key)("s", "password", xor_blob) == "s3cret"
    if HAVE_AES:
        gcm_blob = encrypt_secret_value("s3cret", key, scheme="gcm")
        assert gcm_blob.startswith("enc:gcm:")
        assert encrypted_value_resolver(key)("s", "password", gcm_blob) == "s3cret"


def test_enc_value_xor_scheme_is_authenticated():
    """The xor fallback carries a MAC tag: a wrong master key raises at
    load (same contract as GCM) instead of yielding wrong secrets."""
    import pytest

    from hyperswitch_data_backfill_spark.config import (
        encrypt_secret_value,
        encrypted_value_resolver,
    )

    key = bytes(range(32))
    blob = encrypt_secret_value("top-secret", key, scheme="xor")
    wrong = bytes(b ^ 0xFF for b in key)
    with pytest.raises(ValueError, match="decryption failed"):
        encrypted_value_resolver(wrong)("s", "password", blob)
    # tampered ciphertext also fails closed
    head, hexpart = blob.rsplit(":", 1)
    flipped = f"{head}:{hexpart[:-2]}{'00' if hexpart[-2:] != '00' else '01'}"
    with pytest.raises(ValueError, match="decryption failed"):
        encrypted_value_resolver(key)("s", "password", flipped)


def test_enc_value_unknown_or_missing_scheme_fails_loudly():
    import pytest

    from hyperswitch_data_backfill_spark.config import encrypted_value_resolver

    key = bytes(range(32))
    resolve = encrypted_value_resolver(key)
    # legacy unschemed blob: must be re-encrypted, not guessed at
    with pytest.raises(ValueError, match="cipher scheme"):
        resolve("s", "password", "enc:" + ("ab" * 20))
    with pytest.raises(ValueError, match="cipher scheme"):
        resolve("s", "password", "enc:rot13:" + ("ab" * 20))


def test_encrypt_rejects_unknown_scheme():
    import pytest

    from hyperswitch_data_backfill_spark.config import encrypt_secret_value

    with pytest.raises(ValueError, match="unknown cipher scheme"):
        encrypt_secret_value("x", bytes(32), scheme="rot13")
