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
    jdbc = JdbcSourceConfig(
        url=f"jdbc:postgresql://{db.get('host', 'localhost')}:{db.get('port', 5432)}/"
        f"{db.get('dbname', '')}",
        table=table,
        user=str(db.get("username", "")),
        password=str(db.get("password", "")),
        fetchsize=batch_size,
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
