"""Service-shaped secret resolution — the third resolver backend.

The reference resolves secrets through a *SecretManagementInterface
service client*: ``encryption.rs:11-186`` (``fetch_raw_secrets``) walks
14 config sections — master_database, analytics, replica_database,
secrets, forex_api, jwekey, api_keys, connector_onboarding,
applepay_decrypt_keys, applepay_merchant_configs, payment_method_auth,
key_manager, user_auth_methods, network_tokenization_service — calling
``convert_to_raw_secret(section, client)`` on each, with a printable
"Failed to decrypt <section> configuration" context per section, before
any query runs (``main.rs:62-80``).

config.py's two local resolvers (env override, local master-key
decrypt) prove the hook interface; what a migration from the reference
additionally needs is a resolver with the *fetch-from-an-external-
keyring call shape*: a network round-trip per ciphertext with timeout,
bounded retry, and loud failure semantics. This module provides:

- ``HttpKeyringClient`` — the KMS-decrypt call shape over local HTTP
  (POST /decrypt {section, value} -> {plaintext}), with per-call
  timeout, bounded retries with backoff, and ``SecretFetchError``
  carrying the section/key context on exhaustion;
- ``keyring_resolver(client)`` — adapts the client to config.py's
  ``SecretResolver`` hook so ``load_config`` works unchanged;
- ``fetch_raw_secrets(tree, client)`` — the boot-walk twin of
  encryption.rs: decrypt EVERY ``enc:``-prefixed value in each of the
  reference's 14 secret-bearing sections, fail-fast with the section
  name on the first failure;
- ``StubKeyringServer`` — a file-configured threaded local HTTP server
  holding the master key (the test/demo stand-in for a managed KMS),
  with injectable latency and failure counts so the client's
  timeout/retry semantics are testable.

Everything here is driver-side and boot-time-only; resolved plaintext
travels to executors exactly as config.py documents (closure/broadcast,
never plan literals).
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from hyperswitch_data_backfill_spark.config import (
    ENC_PREFIX,
    SecretResolver,
    encrypted_value_resolver,
)

#: the reference's secret-bearing sections, in fetch_raw_secrets walk
#: order (encryption.rs:16-114; network_tokenization_service is optional
#: there and here)
REFERENCE_SECRET_SECTIONS: tuple[str, ...] = (
    "master_database",
    "analytics",
    "replica_database",
    "secrets",
    "forex_api",
    "jwekey",
    "api_keys",
    "connector_onboarding",
    "applepay_decrypt_keys",
    "applepay_merchant_configs",
    "payment_method_auth",
    "key_manager",
    "user_auth_methods",
    "network_tokenization_service",
)


class SecretFetchError(RuntimeError):
    """Raised when the keyring service cannot produce a plaintext —
    after retries, carrying the section/key context (the moral twin of
    the reference's per-section ``attach_printable``)."""


class HttpKeyringClient:
    """KMS-decrypt call shape over HTTP.

    ``decrypt(section, key, ciphertext)`` POSTs to ``<base_url>/decrypt``
    and returns the plaintext. Failure semantics:

    - network error / non-200 / timeout → retried up to ``retries``
      times with ``backoff * attempt`` sleeps;
    - exhaustion → ``SecretFetchError`` naming the section and key;
    - a 4xx (the service *rejected* the ciphertext — wrong key id,
      tamper) is NOT retried: it fails immediately, because retrying a
      deterministic rejection only delays the boot failure.
    """

    _LOOPBACK_HOSTS = ("127.0.0.1", "localhost", "::1", "[::1]")

    def __init__(self, base_url: str, *, timeout: float = 2.0,
                 retries: int = 2, backoff: float = 0.05,
                 auth_token: str | None = None,
                 allow_insecure_transport: bool = False):
        """``auth_token`` is sent as ``Authorization: Bearer <token>`` on
        every call (the hook a KMS facade's token/mTLS front door needs).
        Plain ``http://`` to a non-loopback host ships plaintext secrets
        across the network, so it is REFUSED at construction unless
        ``allow_insecure_transport=True`` is passed explicitly — the
        localhost stub keeps working, a copy-pasted production URL fails
        loudly before the first secret moves."""
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.retries = retries
        self.backoff = backoff
        self.auth_token = auth_token
        split = urllib.parse.urlsplit(self.base_url)
        host = split.hostname or ""
        # Scheme compare must be case-insensitive: urllib happily opens
        # HTTP://prod-host cleartext, so a literal "http://" prefix match
        # would let mixed-case URLs bypass the refusal.
        if (
            split.scheme.lower() == "http"
            and host not in self._LOOPBACK_HOSTS
            and not allow_insecure_transport
        ):
            raise ValueError(
                f"refusing plain http:// keyring transport to non-loopback "
                f"host {host!r}: decrypted secrets would cross the network "
                "unencrypted. Use https://, or pass "
                "allow_insecure_transport=True if this is a trusted tunnel."
            )

    def decrypt(self, section: str, key: str, ciphertext: str) -> str:
        body = json.dumps(
            {"section": section, "key": key, "value": ciphertext}
        ).encode()
        headers = {"Content-Type": "application/json"}
        if self.auth_token:
            headers["Authorization"] = f"Bearer {self.auth_token}"
        last_err: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                req = urllib.request.Request(
                    f"{self.base_url}/decrypt", data=body, headers=headers,
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read())["plaintext"]
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500:  # deterministic rejection: no retry
                    detail = ""
                    try:
                        detail = json.loads(e.read()).get("error", "")
                    except Exception:
                        pass
                    raise SecretFetchError(
                        f"failed to decrypt [{section}].{key}: keyring "
                        f"rejected the ciphertext ({e.code} {detail})"
                    ) from e
                last_err = e
            except Exception as e:  # URLError (conn refused), timeout, bad JSON
                last_err = e
            if attempt < self.retries:
                time.sleep(self.backoff * (attempt + 1))
        raise SecretFetchError(
            f"failed to decrypt [{section}].{key}: keyring service "
            f"unreachable after {self.retries + 1} attempts ({last_err})"
        ) from last_err


def keyring_resolver(client: HttpKeyringClient) -> SecretResolver:
    """Adapt the service client to config.py's resolver hook: every
    ``enc:``-prefixed secret value goes through the keyring service;
    plaintext values pass through unchanged (mixed configs work exactly
    like the local resolvers)."""

    def resolve(section: str, key: str, value: str) -> str:
        if not value.startswith(ENC_PREFIX):
            return value
        return client.decrypt(section, key, value)

    return resolve


def fetch_raw_secrets(tree: dict, client: HttpKeyringClient) -> dict:
    """Boot-walk twin of ``encryption.rs:11-186``: for each of the
    reference's 14 secret-bearing sections present in ``tree``, send
    every ``enc:``-prefixed string value (at any nesting depth) through
    the keyring service; other sections and non-ciphertext values pass
    through untouched. Fail-fast: the first unresolvable secret aborts
    the boot with the section context — the reference's behavior
    (it panics per-section) minus the panic."""

    def walk(node, section: str):
        if isinstance(node, dict):
            return {k: walk(v, section) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            # TOML arrays (e.g. a list of connector entries) can nest
            # ciphertexts too — recurse so none passes through unresolved
            return [walk(v, section) for v in node]
        if isinstance(node, str) and node.startswith(ENC_PREFIX):
            # key name is best-effort context only; the walk decrypts by
            # value shape, like convert_to_raw_secret's masked fields
            return client.decrypt(section, "<section-walk>", node)
        return node

    out = dict(tree)
    for section in REFERENCE_SECRET_SECTIONS:
        if section in out:
            try:
                out[section] = walk(out[section], section)
            except SecretFetchError:
                raise
            except Exception as e:  # pragma: no cover - defensive context
                raise SecretFetchError(
                    f"failed to decrypt {section} configuration: {e}"
                ) from e
    return out


class _StubHandler(BaseHTTPRequestHandler):
    server: "StubKeyringServer"

    def do_POST(self):  # noqa: N802 (http.server API)
        srv: StubKeyringServer = self.server  # type: ignore[assignment]
        if srv.latency:
            time.sleep(srv.latency)
        if srv.require_token is not None:
            if self.headers.get("Authorization") != f"Bearer {srv.require_token}":
                self._reply(401, {"error": "missing or invalid bearer token"})
                return
        if srv.fail_next > 0:
            srv.fail_next -= 1
            self._reply(503, {"error": "transient keyring failure (injected)"})
            return
        try:
            req = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            pt = srv._resolve(req["section"], req["key"], req["value"])
            self._reply(200, {"plaintext": pt})
        except ValueError as e:  # wrong key / tamper / unknown scheme
            self._reply(400, {"error": str(e)})
        except Exception as e:  # pragma: no cover
            self._reply(500, {"error": str(e)})

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


class StubKeyringServer(ThreadingHTTPServer):
    """Local keyring stand-in: holds the master key, decrypts POSTed
    ciphertexts with config.py's scheme-tagged format. Test/demo only —
    a real deployment points HttpKeyringClient at a managed KMS facade
    with the same two-verb API.

    Context manager: ``with StubKeyringServer(master_key) as url: ...``.
    ``latency`` (seconds) and ``fail_next`` (count of injected 503s) are
    mutable knobs for exercising client timeout/retry paths.
    """

    def __init__(self, master_key: bytes, *, latency: float = 0.0,
                 require_token: str | None = None):
        super().__init__(("127.0.0.1", 0), _StubHandler)
        self._resolve = encrypted_value_resolver(master_key)
        self.latency = latency
        self.fail_next = 0
        self.require_token = require_token
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self.server_address[:2]
        return f"http://{host}:{port}"

    def __enter__(self) -> str:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self.url

    def __exit__(self, *exc):
        self.shutdown()
        self.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        return False
