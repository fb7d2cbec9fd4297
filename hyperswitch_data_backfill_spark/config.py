"""TOML config + secret bootstrap — SURVEY §2.1 S5 parity.

The reference boots by loading a TOML settings tree (``config/
development.toml``) and then resolving every secret-bearing section
through a secret-management client before any query runs
(``encryption.rs:11-186`` walks 14 sections — master/replica database,
[secrets], jwekey, api_keys, … — calling ``convert_to_raw_secret`` on
each; ``main.rs:62-80`` wires it up). Our engine needs exactly two of
those sections to run a backfill — ``[replica_database]`` (the JDBC
source, development.toml:31-38) and ``[events.kafka]`` (the sink +
topic map, development.toml:657-673) — plus ``[secrets]`` for the
master encryption key (development.toml:62-65) used by the U1/U4
crypto functions.

Spark-first re-expression: config resolution is DRIVER-side, one-time,
and tiny — there is nothing to distribute. What matters at scale is
that resolved secrets travel to executors only inside broadcast/closure
variables (never written to the plan as literals that would show up in
``explain`` output or the event log — see ``redact()``).

Secret resolution is a pluggable hook instead of a KMS client: pass any
``Callable[[section, key, value], str]`` (e.g. an env-var override or a
real KMS lookup). The default resolver checks
``HYPERSWITCH_SECRET_<SECTION>_<KEY>`` in the environment and otherwise
returns the TOML value unchanged — the moral equivalent of the
reference's ``NoEncryption`` secret-management backend.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field
from typing import Callable

from hyperswitch_data_backfill_spark.sinks.kafka import KafkaSinkConfig
from hyperswitch_data_backfill_spark.sources.jdbc import JdbcSourceConfig

SecretResolver = Callable[[str, str, str], str]

#: TOML keys whose values are secrets: resolved via the hook, redacted in repr.
SECRET_KEYS = {"password", "master_enc_key", "admin_api_key", "jwt_secret"}


def env_resolver(section: str, key: str, value: str) -> str:
    """Default hook: HYPERSWITCH_SECRET_<SECTION>_<KEY> env override, else as-is."""
    return os.environ.get(f"HYPERSWITCH_SECRET_{section}_{key}".upper(), value)


#: prefix marking a config value as KMS-style ciphertext:
#: "enc:<scheme>:<hex(nonce||ct)>" with scheme ∈ {gcm, xor}. The scheme
#: is recorded AT ENCRYPT TIME so decrypt never guesses from the local
#: environment: a gcm blob on a container without `cryptography` fails
#: loudly instead of being silently XOR-"decrypted" into garbage.
ENC_PREFIX = "enc:"
_NONCE_LEN = 12  # AES-GCM standard nonce size; also used by the XOR fallback
_XOR_TAG_LEN = 16  # truncated SHA-256 MAC appended by the xor scheme
_SCHEMES = ("gcm", "xor")


def _xor_tag(master_key: bytes, nonce: bytes, plaintext: bytes) -> bytes:
    """Integrity tag for the xor scheme so a wrong master key raises at
    load (matching GCM's authenticated contract) instead of yielding
    wrong secrets silently."""
    import hashlib

    return hashlib.sha256(b"cfg-mac:" + master_key + nonce + plaintext).digest()[:_XOR_TAG_LEN]


def encrypt_secret_value(
    plaintext: str, master_key: bytes, nonce: bytes | None = None, scheme: str | None = None
) -> str:
    """Produce an ``enc:<scheme>:<hex>`` config value the encrypted-value
    resolver can decrypt — the write side of the reference's KMS-encrypted
    config (``encryption.rs:11-186`` stores ciphertext in the settings
    tree and decrypts each section at boot).

    ``scheme='gcm'`` → AES-256-GCM (authenticated; needs the
    ``cryptography`` package). ``scheme='xor'`` → the deterministic
    SHA-256 CTR XOR cipher the U1 decrypt UDF falls back to
    (functions/crypto.py) plus a truncated-SHA-256 MAC — same
    fail-on-bad-key contract, NOT for production use. Default: gcm when
    available, else xor; either way the chosen scheme is embedded in the
    value so decryption on a differently-provisioned host cannot
    mis-dispatch.
    """
    from hyperswitch_data_backfill_spark.functions import crypto

    if scheme is None:
        scheme = "gcm" if crypto.HAVE_AES else "xor"
    if scheme not in _SCHEMES:
        raise ValueError(f"unknown cipher scheme {scheme!r}; expected one of {_SCHEMES}")
    if nonce is None:
        nonce = os.urandom(_NONCE_LEN)
    if len(nonce) != _NONCE_LEN:
        raise ValueError(f"nonce must be {_NONCE_LEN} bytes, got {len(nonce)}")
    data = plaintext.encode()
    if scheme == "gcm":
        if not crypto.HAVE_AES:
            raise ValueError(
                "scheme 'gcm' requires the cryptography package; "
                "use scheme='xor' or install it"
            )
        ct = crypto.aes_gcm_encrypt(data, master_key, nonce)
    else:
        ct = crypto.xor_cipher(data, master_key + nonce) + _xor_tag(master_key, nonce, data)
    return f"{ENC_PREFIX}{scheme}:{(nonce + ct).hex()}"


def reencrypt_legacy_value(
    value: str, master_key: bytes, *, legacy_scheme: str, scheme: str | None = None
) -> str:
    """One-shot migration for pre-scheme-tag ``enc:<hex>`` blobs (the
    format rounds 1-5 emitted) to the current ``enc:<scheme>:<hex>``
    format, which the resolver otherwise rejects with no decrypt path.

    The legacy format recorded no scheme — decrypt used to guess from
    the local environment — so the caller must state via
    ``legacy_scheme`` ('gcm' or 'xor') which cipher produced the blob:
    an explicit opt-in, never a guess, because XOR-"decrypting" a GCM
    blob would emit garbage as plaintext. Legacy xor blobs carried no
    MAC either, so for those the only integrity check is the UTF-8
    decode — eyeball the re-encrypted config's plaintext via a test
    decrypt before deploying. Already-tagged values pass through
    unchanged (idempotent), so the helper can walk a whole config.
    ``scheme`` picks the output cipher (default: gcm when available).
    See tools/reencrypt_config.py for the file-level walk."""
    from hyperswitch_data_backfill_spark.functions import crypto

    if not value.startswith(ENC_PREFIX):
        return value
    body = value[len(ENC_PREFIX):]
    maybe_scheme = body.partition(":")[0]
    if maybe_scheme in _SCHEMES:
        return value  # already scheme-tagged — idempotent
    if legacy_scheme not in _SCHEMES:
        raise ValueError(
            f"legacy_scheme must be one of {_SCHEMES}, got {legacy_scheme!r}"
        )
    try:
        blob = bytes.fromhex(body)
    except ValueError as e:
        raise ValueError(f"legacy enc: value is not hex: {e}") from e
    nonce, ct = blob[:_NONCE_LEN], blob[_NONCE_LEN:]
    if legacy_scheme == "gcm":
        if not crypto.HAVE_AES:
            raise ValueError(
                "legacy_scheme 'gcm' requires the cryptography package"
            )
        pt = crypto.aes_gcm_decrypt(ct, master_key, nonce)
        if pt is None:
            raise ValueError(
                "legacy blob decryption failed (wrong master key, tampered "
                "ciphertext, or the blob was actually xor-encrypted)"
            )
    else:
        # legacy xor had no MAC: UTF-8 decode below is the only guard
        pt = crypto.xor_cipher(ct, master_key + nonce)
    return encrypt_secret_value(pt.decode(), master_key, scheme=scheme)


def encrypted_value_resolver(master_key: bytes) -> SecretResolver:
    """Second resolver backend (≙ the reference's real secret-management
    client, vs env_resolver's NoEncryption): any secret whose TOML value
    is ``enc:<scheme>:<hex(nonce||ciphertext)>`` is decrypted with the
    master key; plaintext values pass through unchanged, so one config
    file can mix encrypted and clear sections exactly like the
    reference's 14-section walk. Decryption is driver-side and one-time;
    a bad key, tampered ciphertext, unknown scheme, or a scheme the local
    host can't run (gcm without `cryptography`) raises at load, before
    any query runs."""
    from hyperswitch_data_backfill_spark.functions import crypto

    def resolve(section: str, key: str, value: str) -> str:
        if not value.startswith(ENC_PREFIX):
            return value
        body = value[len(ENC_PREFIX):]
        scheme, sep, hexblob = body.partition(":")
        if not sep or scheme not in _SCHEMES:
            raise ValueError(
                f"secret [{section}].{key}: missing/unknown cipher scheme in "
                f"'enc:' value (expected enc:<scheme>:<hex> with scheme in "
                f"{_SCHEMES}; legacy unschemed 'enc:<hex>' blobs must be "
                "re-encrypted with encrypt_secret_value)"
            )
        blob = bytes.fromhex(hexblob)
        nonce, ct = blob[:_NONCE_LEN], blob[_NONCE_LEN:]
        if scheme == "gcm":
            if not crypto.HAVE_AES:
                raise ValueError(
                    f"secret [{section}].{key}: encrypted with AES-GCM but the "
                    "cryptography package is not installed on this host"
                )
            pt = crypto.aes_gcm_decrypt(ct, master_key, nonce)
            if pt is None:
                raise ValueError(
                    f"secret [{section}].{key}: decryption failed "
                    "(wrong master key or tampered ciphertext)"
                )
        else:
            ct, tag = ct[:-_XOR_TAG_LEN], ct[-_XOR_TAG_LEN:]
            pt = crypto.xor_cipher(ct, master_key + nonce)
            if _xor_tag(master_key, nonce, pt) != tag:
                raise ValueError(
                    f"secret [{section}].{key}: decryption failed "
                    "(wrong master key or tampered ciphertext)"
                )
        return pt.decode()

    return resolve


@dataclass(frozen=True)
class AppConfig:
    """Resolved app settings — the subset of the reference's Settings tree we use."""

    replica_database: JdbcSourceConfig
    kafka: KafkaSinkConfig
    master_enc_key: str = ""  # hex, ≙ [secrets].master_enc_key (development.toml:64)
    raw: dict = field(default_factory=dict, repr=False)  # full parsed tree, secrets resolved

    def redact(self) -> dict:
        """Loggable view with every secret value masked."""

        def walk(node):
            if isinstance(node, dict):
                return {
                    k: ("***" if k in SECRET_KEYS else walk(v)) for k, v in node.items()
                }
            return node

        return walk(self.raw)


def _resolve_secrets(tree: dict, resolver: SecretResolver, _section: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _resolve_secrets(v, resolver, k)
        elif isinstance(v, str) and k in SECRET_KEYS:
            out[k] = resolver(_section or "root", k, v)
        else:
            out[k] = v
    return out


def load_config(
    path: str,
    *,
    table: str = "",
    tenant_id: str = "default",
    batch_size: int = 10_000,
    resolver: SecretResolver = env_resolver,
) -> AppConfig:
    """Parse a reference-shaped TOML file into engine config dataclasses.

    ``[replica_database]`` username/password/host/port/dbname →
    ``JdbcSourceConfig`` (``table`` supplied by the caller — the
    reference binds tables per entity pipeline, not in config);
    ``[events.kafka]`` brokers + ``*_topic`` keys → ``KafkaSinkConfig``
    with an entity→topic map (``intent_analytics_topic`` → entity
    ``intent``) and the consolidated topic (development.toml:672).
    """
    with open(path, "rb") as f:
        tree = _resolve_secrets(tomllib.load(f), resolver)

    db = tree.get("replica_database", {})
    # explicit `url` (+ optional `driver`) overrides the postgres
    # host/port/dbname assembly — lets one config target any JDBC
    # database (the CLI's Derby integration test uses this)
    url = db.get("url") or (
        f"jdbc:postgresql://{db.get('host', 'localhost')}:{db.get('port', 5432)}/"
        f"{db.get('dbname', '')}"
    )
    jdbc = JdbcSourceConfig(
        url=url,
        table=table,
        user=str(db.get("username", "")),
        password=str(db.get("password", "")),
        fetchsize=batch_size,
        options={"driver": db["driver"]} if db.get("driver") else {},
    )

    ek = tree.get("events", {}).get("kafka", {})
    topics = {
        k.removesuffix("_analytics_topic").removesuffix("_logs_topic").removesuffix(
            "_events_topic"
        ): v
        for k, v in ek.items()
        if k.endswith("_topic") and k != "consolidated_events_topic"
    }
    kafka = KafkaSinkConfig(
        bootstrap_servers=",".join(ek.get("brokers", [])),
        topics=topics,
        consolidated_topic=ek.get("consolidated_events_topic"),
        tenant_id=tenant_id,
    )

    master = str(tree.get("secrets", {}).get("master_enc_key", ""))
    return AppConfig(replica_database=jdbc, kafka=kafka, master_enc_key=master, raw=tree)
