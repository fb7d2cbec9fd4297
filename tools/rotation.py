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
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from hyperswitch_data_backfill_spark import registry  # noqa: E402


def evidence_ages() -> dict[str, tuple[int, str]]:
    """key -> (latest round with a usable driver record, kind)."""
    repo = Path(__file__).resolve().parent.parent
    latest: dict[str, tuple[int, str]] = {}
    for f in sorted(repo.glob("CORRECTNESS_r0*.json")):
        rnd = int(f.stem[len("CORRECTNESS_r"):])
        for key, row in json.loads(f.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                latest[key] = (rnd, "green")
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                prev = latest.get(key)
                if prev is None or prev[0] < rnd:
                    latest[key] = (rnd, "rows_only")
            elif row.get("err") and key not in latest:
                latest[key] = (rnd, "ERR")
    return latest


def main() -> None:
    size = 50
    if "--window-size" in sys.argv:
        size = int(sys.argv[sys.argv.index("--window-size") + 1])
    registry._load_all_operator_modules()
    ages = evidence_ages()
    keys = list(registry.REGISTRY)

    def rank(k: str) -> tuple[int, int]:
        rec = ages.get(k)
        if rec is None:
            return (-2, 0)           # never swept: always first
        rnd, kind = rec
        if kind == "ERR":
            return (-1, rnd)         # last record errored: next
        return (rnd, 0)              # then oldest-evidence-first

    ordered = sorted(keys, key=lambda k: (rank(k), k))
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
