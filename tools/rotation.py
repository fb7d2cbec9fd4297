"""Driver-window rotation helper: compute per-key evidence age and
print the suggested next _DRIVER_WINDOW.

The registry's rotation policy (registry.py) is: every key must be in
the 50-slot driver window or carry a driver record in a shipped
CORRECTNESS_r0*.json; each round the window holds (1) new/changed keys
— which this tool cannot detect, it flags zero-evidence keys and leaves
a placeholder comment for changed implementations — then (2) the
oldest-evidence keys, oldest round first, until the 50 slots are full.

Usage: python tools/rotation.py [--window-size 50]
Prints: one line per registered key (evidence round + kind), then the
suggested window as a Python list ready to paste into registry.py.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO_ROOT))

from hyperswitch_data_backfill_spark import registry  # noqa: E402

_CORRECTNESS_RE = re.compile(r"CORRECTNESS_r(\d+)\.json")


def correctness_files(max_round: int | None = None) -> list[tuple[int, Path]]:
    """Shipped driver artifacts as (round, path), ascending by the PARSED
    round number (so r10 sorts after r9, not between r1 and r2).
    Non-matching names (e.g. CORRECTNESS_r09_backup.json) are skipped
    with a warning instead of crashing the rotation (round-9 ADVICE).
    ``max_round`` drops artifacts newer than the given round — the
    tripwire uses it to recompute the suggestion the builder saw at
    rotation time, before the driver's post-snapshot drop."""
    out: list[tuple[int, Path]] = []
    for f in _REPO_ROOT.glob("CORRECTNESS_*.json"):
        m = _CORRECTNESS_RE.fullmatch(f.name)
        if m is None:
            print(f"rotation: skipping non-artifact file {f.name}", file=sys.stderr)
            continue
        rnd = int(m.group(1))
        if max_round is None or rnd <= max_round:
            out.append((rnd, f))
    return sorted(out)


def evidence_ages(max_round: int | None = None) -> dict[str, tuple[int, str]]:
    """key -> (latest round with a driver record, kind).

    Files are walked in round order, so each key's entry reflects its
    LATEST record — including regressions: a round-N red row (hash or
    row-count mismatch, or a hard error) overwrites an older green, so a
    regressed key ranks as RED/ERR (front of the window) instead of
    riding its stale green."""
    latest: dict[str, tuple[int, str]] = {}
    for rnd, f in correctness_files(max_round):
        for key, row in json.loads(f.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                latest[key] = (rnd, "green")
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                latest[key] = (rnd, "rows_only")
            elif row.get("err"):
                latest[key] = (rnd, "ERR")
            else:  # oracle ran and mismatched: a real red, not an infra error
                latest[key] = (rnd, "RED")
    return latest


def ordered_keys(
    prepend: tuple[str, ...] = (), max_round: int | None = None
) -> list[str]:
    """Every registered key ranked for the next window: ``prepend``
    (keys whose IMPLEMENTATION changed since their latest driver record
    — the one thing evidence files can't detect) first in the given
    order, then never-swept, then latest-record-RED/ERR, then
    green/rows-only oldest-round-first (alphabetical within a round)."""
    registry._load_all_operator_modules()
    ages = evidence_ages(max_round)
    keys = list(registry.REGISTRY)
    unknown = [k for k in prepend if k not in registry.REGISTRY]
    if unknown:
        raise KeyError(f"prepend names unregistered keys: {unknown}")

    def rank(k: str) -> tuple[int, int]:
        rec = ages.get(k)
        if rec is None:
            return (-3, 0)           # never swept: always first
        rnd, kind = rec
        if kind == "RED":
            return (-2, rnd)         # latest record mismatched: next
        if kind == "ERR":
            return (-1, rnd)         # latest record errored: next
        return (rnd, 0)              # then oldest-evidence-first

    ranked = sorted(
        (k for k in keys if k not in set(prepend)),
        key=lambda k: (rank(k), k),
    )
    return list(prepend) + ranked


def suggested_window(
    size: int = 50,
    prepend: tuple[str, ...] = (),
    max_round: int | None = None,
) -> list[str]:
    """The next ``_DRIVER_WINDOW``: first ``size`` of ``ordered_keys``.
    registry.py commits this list verbatim (plus the evidence-round pin
    ``_WINDOW_EVIDENCE_ROUND``) and tests/test_registry.py asserts the
    committed copy matches the suggestion recomputed at that pin, so the
    rotation can never again be written down but not executed (r8
    verdict item 2) — while a driver artifact landing after the
    builder's snapshot no longer flips the tripwire red (r9 verdict
    item 2)."""
    return ordered_keys(prepend, max_round)[:size]


def main() -> None:
    size = 50
    if "--window-size" in sys.argv:
        size = int(sys.argv[sys.argv.index("--window-size") + 1])
    ages = evidence_ages()
    ordered = ordered_keys()
    for k in ordered:
        rec = ages.get(k)
        print(f"{rec[0] if rec else '-':>2} {rec[1] if rec else 'NEVER':<9} {k}")

    window = ordered[:size]
    print(f"\n# suggested window ({len(window)} slots; prepend any keys whose")
    print("# implementation changed since their latest driver record):")
    print("_DRIVER_WINDOW = [")
    for k in window:
        rec = ages.get(k)
        tag = f"{rec[1]} r{rec[0]}" if rec else "no evidence"
        print(f'    "{k}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
