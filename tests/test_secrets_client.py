"""Keyring-service secret resolution (secrets_client.py) — the
service-call-shaped third resolver backend mirroring the reference's
SecretManagementInterface boot walk (encryption.rs:11-186).

No Spark needed: config resolution is driver-side and boot-time-only.
"""

from __future__ import annotations

import tomllib

import pytest

from hyperswitch_data_backfill_spark.config import (
    encrypt_secret_value,
    load_config,
)
from hyperswitch_data_backfill_spark.secrets_client import (
    REFERENCE_SECRET_SECTIONS,
    HttpKeyringClient,
    SecretFetchError,
    StubKeyringServer,
    fetch_raw_secrets,
    keyring_resolver,
)

MASTER = bytes(range(32))


def _client(url, **kw):
    kw.setdefault("timeout", 2.0)
    kw.setdefault("retries", 2)
    kw.setdefault("backoff", 0.01)
    return HttpKeyringClient(url, **kw)


def test_boot_walk_decrypts_all_fourteen_reference_sections():
    """The fetch_raw_secrets twin: a config with every one of the
    reference's 14 secret-bearing sections, each holding ciphertext,
    round-trips through the keyring service in one boot walk."""
    assert len(REFERENCE_SECRET_SECTIONS) == 14
    tree = {
        section: {
            "some_clear_setting": "untouched",
            "secret_value": encrypt_secret_value(f"raw::{section}", MASTER),
            "nested": {"inner_secret": encrypt_secret_value(f"deep::{section}", MASTER)},
        }
        for section in REFERENCE_SECRET_SECTIONS
    }
    tree["server"] = {"host": "0.0.0.0"}  # non-secret section: untouched

    with StubKeyringServer(MASTER) as url:
        raw = fetch_raw_secrets(tree, _client(url))

    for section in REFERENCE_SECRET_SECTIONS:
        assert raw[section]["secret_value"] == f"raw::{section}"
        assert raw[section]["nested"]["inner_secret"] == f"deep::{section}"
        assert raw[section]["some_clear_setting"] == "untouched"
    assert raw["server"] == {"host": "0.0.0.0"}


def test_load_config_with_keyring_resolver(tmp_path):
    """The standard load_config path works with the service resolver —
    same TOML, same dataclasses, secrets fetched over the wire."""
    enc_pass = encrypt_secret_value("db-pass", MASTER)
    p = tmp_path / "svc.toml"
    p.write_text(
        f'[replica_database]\nusername = "ro_user"\npassword = "{enc_pass}"\n'
        'host = "db.internal"\nport = 5432\ndbname = "payments"\n'
        "\n[events.kafka]\nbrokers = [\"b:9092\"]\n"
        'intent_analytics_topic = "intents"\n'
    )
    with StubKeyringServer(MASTER) as url:
        cfg = load_config(str(p), resolver=keyring_resolver(_client(url)))
    assert cfg.replica_database.password == "db-pass"
    assert cfg.replica_database.user == "ro_user"
    assert cfg.kafka.topics == {"intent": "intents"}
    # redaction still masks the (now-plaintext) secret
    assert cfg.redact()["replica_database"]["password"] == "***"


def test_transient_failures_are_retried():
    srv = StubKeyringServer(MASTER)
    with srv as url:
        srv.fail_next = 2  # two 503s, then success; retries=2 → 3 attempts
        enc = encrypt_secret_value("flaky", MASTER)
        assert _client(url).decrypt("s", "k", enc) == "flaky"


def test_exhausted_retries_raise_with_section_context():
    srv = StubKeyringServer(MASTER)
    with srv as url:
        srv.fail_next = 10
        enc = encrypt_secret_value("nope", MASTER)
        with pytest.raises(SecretFetchError, match=r"\[jwekey\].jwt_secret"):
            _client(url, retries=1).decrypt("jwekey", "jwt_secret", enc)


def test_unreachable_service_raises_not_hangs():
    client = _client("http://127.0.0.1:9", retries=1, timeout=0.5)
    with pytest.raises(SecretFetchError, match="unreachable"):
        client.decrypt("secrets", "master_enc_key", "enc:xor:00")


def test_slow_service_times_out():
    srv = StubKeyringServer(MASTER, latency=1.5)
    with srv as url:
        enc = encrypt_secret_value("slow", MASTER)
        with pytest.raises(SecretFetchError):
            _client(url, timeout=0.2, retries=0).decrypt("s", "k", enc)


def test_rejected_ciphertext_fails_fast_without_retry():
    """A 4xx (wrong master key server-side / tampered blob) is a
    deterministic rejection: one attempt, loud error, no retry loop."""
    wrong_key_server = StubKeyringServer(bytes(32))  # holds the WRONG key
    with wrong_key_server as url:
        enc = encrypt_secret_value("secret", MASTER)  # encrypted under MASTER
        client = _client(url, retries=5, backoff=10.0)  # retries would be slow
        import time

        t0 = time.monotonic()
        with pytest.raises(SecretFetchError, match="rejected"):
            client.decrypt("api_keys", "admin_api_key", enc)
        assert time.monotonic() - t0 < 5.0  # no backoff sleeps happened


def test_boot_walk_aborts_on_first_unresolvable_section():
    tree = {
        "master_database": {"password": encrypt_secret_value("ok", MASTER)},
        "jwekey": {"jwt_secret": "enc:xor:deadbeef"},  # garbage blob
    }
    with StubKeyringServer(MASTER) as url:
        with pytest.raises(SecretFetchError, match="jwekey"):
            fetch_raw_secrets(tree, _client(url))


def test_plaintext_values_never_touch_the_wire():
    """Non-enc values pass through without a service call — a dead
    service is fine for a fully-plaintext config."""
    client = _client("http://127.0.0.1:9", retries=0, timeout=0.2)
    resolve = keyring_resolver(client)
    assert resolve("replica_database", "password", "clear-pass") == "clear-pass"
    tree = {"secrets": {"master_enc_key": "deadbeef"}}
    assert fetch_raw_secrets(tree, client) == tree


def test_sections_toml_shape_parses():
    """The 14-section walk works on a real TOML document end-to-end
    (parse → walk → assert), not just on hand-built dicts."""
    doc = "\n".join(
        f'[{s}]\nsecret_value = "{encrypt_secret_value("v-" + s, MASTER)}"'
        for s in REFERENCE_SECRET_SECTIONS
    )
    tree = tomllib.loads(doc)
    with StubKeyringServer(MASTER) as url:
        raw = fetch_raw_secrets(tree, _client(url))
    assert all(raw[s]["secret_value"] == "v-" + s for s in REFERENCE_SECRET_SECTIONS)


def test_boot_walk_recurses_into_toml_arrays():
    """An enc: ciphertext nested inside a TOML array (e.g. a list of
    connector credential tables) is resolved too — round-6's walk only
    recursed into dicts and silently passed list-nested ciphertext
    through (r6 advisory #1)."""
    ct = encrypt_secret_value("list-secret", MASTER)
    tree = {
        "api_keys": {
            "connectors": [
                {"name": "a", "api_key": ct},
                {"name": "b", "api_key": "plain"},
            ],
            "flat_list": [ct, "plain"],
        }
    }
    with StubKeyringServer(MASTER) as url:
        raw = fetch_raw_secrets(tree, _client(url))
    assert raw["api_keys"]["connectors"][0]["api_key"] == "list-secret"
    assert raw["api_keys"]["connectors"][1]["api_key"] == "plain"
    assert raw["api_keys"]["flat_list"] == ["list-secret", "plain"]


def test_insecure_remote_transport_refused():
    """Plain http:// to a non-loopback host would ship decrypted
    secrets across the network — constructing such a client raises
    unless explicitly overridden (r6 advisory #3)."""
    with pytest.raises(ValueError, match="refusing plain http"):
        HttpKeyringClient("http://keyring.internal:8200")
    # loopback stays allowed (the stub server's whole point)
    HttpKeyringClient("http://127.0.0.1:9")
    HttpKeyringClient("http://localhost:9")
    # https is fine anywhere; explicit override is honored
    HttpKeyringClient("https://keyring.internal:8200")
    HttpKeyringClient("http://keyring.internal:8200", allow_insecure_transport=True)
    # scheme compare is case-insensitive: urllib opens HTTP:// cleartext
    # just the same, so mixed case must not bypass the refusal (r7 advisory)
    with pytest.raises(ValueError, match="refusing plain http"):
        HttpKeyringClient("HTTP://keyring.internal:8200")
    with pytest.raises(ValueError, match="refusing plain http"):
        HttpKeyringClient("Http://keyring.internal:8200")


def test_bearer_token_auth_round_trip():
    """auth_token is sent as a Bearer header; the stub enforces it —
    wrong/missing token is a 401 (deterministic rejection, no retry)."""
    ct = encrypt_secret_value("tok-secret", MASTER)
    with StubKeyringServer(MASTER, require_token="s3cr3t-token") as url:
        ok = _client(url, auth_token="s3cr3t-token")
        assert ok.decrypt("secrets", "master_enc_key", ct) == "tok-secret"
        bad = _client(url, auth_token="wrong", retries=3)
        with pytest.raises(SecretFetchError, match="rejected"):
            bad.decrypt("secrets", "master_enc_key", ct)
        missing = _client(url)
        with pytest.raises(SecretFetchError, match="rejected"):
            missing.decrypt("secrets", "master_enc_key", ct)
