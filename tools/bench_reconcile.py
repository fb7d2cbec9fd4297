"""Standing round-close bench reconciliation (r6 verdict item 2).

Compares two bench records (BENCH_r{N}.json driver files — `parsed`
payload — or raw bench.py JSON lines), lists every per-query mover
beyond --threshold (default 10%) in BOTH directions, and runs
tools/isolate_bench.py min-of-N on each slowdown so noise and real
regressions are separated the same way every round instead of on
verdict demand. Improvement movers are listed but not isolated — a
large unexplained speedup sometimes signals a broken or
short-circuited plan, so the list exists to be eyeballed.

Verdict rule encoded here (BENCH_NOTES §round-6 reconciliation):
a mover is NOISE if its isolated min is at or below the older sweep
value (+5% slack, or inside the 50 ms per-job scheduling jitter for
sub-200 ms queries); otherwise it is flagged REGRESSION for a plan
diff. Output is a ready-to-paste markdown table.

Usage:
    python tools/bench_reconcile.py BENCH_r05.json BENCH_r06.json \
        [--threshold 0.10] [--n 8] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def load_queries(path: str) -> dict[str, float]:
    d = json.loads(Path(path).read_text())
    if "parsed" in d:  # driver BENCH_r{N}.json wrapper
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.10)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-isolate", action="store_true",
                    help="only list movers; skip the isolated re-runs")
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    movers = []        # slowdowns: isolated + adjudicated
    speedups = []      # improvements: listed (a big one can mean a
    for q in sorted(set(old) & set(new)):  # broken/short-circuited plan)
        if old[q] <= 0:
            continue
        delta = (new[q] - old[q]) / old[q]
        if delta >= args.threshold:
            movers.append((q, old[q], new[q], delta))
        elif -delta >= args.threshold:
            speedups.append((q, old[q], new[q], delta))
    if speedups:
        print(f"{len(speedups)} improvement mover(s) beyond "
              f"-{args.threshold:.0%} (not isolated — eyeball for "
              "short-circuited plans):")
        for q, o, n, d in speedups:
            print(f"  {q}: {o:.3f} -> {n:.3f} ({d:+.0%})")
    if not movers:
        print(f"no slowdown movers beyond +{args.threshold:.0%} — "
              "nothing to reconcile")
        return 0
    print(f"{len(movers)} slowdown mover(s) beyond +{args.threshold:.0%}:")
    for q, o, n, d in movers:
        print(f"  {q}: {o:.3f} -> {n:.3f} ({d:+.0%})")
    if args.no_isolate:
        return 0

    print(f"\nisolating (min of {args.n}, fresh JVM per query, "
          f"loadavg now {os.getloadavg()[0]:.2f})...")
    rows = ["| query | old sweep | new sweep | isolated min "
            f"(n={args.n}) | verdict |", "|---|---|---|---|---|"]
    worst = 0
    iso_failed = False
    for q, o, n, d in movers:
        out = subprocess.run(
            [sys.executable, str(_REPO / "tools" / "isolate_bench.py"),
             q, "--n", str(args.n), "--sf-dir", args.sf_dir],
            capture_output=True, text=True, cwd=_REPO,
        )
        try:
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            iso = rec["min_sec"]
        except Exception:
            rows.append(f"| {q} | {o:.3f} | {n:.3f} | ERROR | isolate failed |")
            iso_failed = True
            continue
        jitter_floor = 0.05  # per-job scheduling jitter for tiny queries
        if iso <= o * 1.05 or (o < 0.2 and iso <= o + jitter_floor):
            verdict = "noise — isolated ≤ old (+5%)"
        else:
            verdict = f"REGRESSION — isolated {iso/o:.2f}x old; diff the plan"
            worst = max(worst, 1)
        rows.append(f"| {q} | {o:.3f} | {n:.3f} | **{iso:.3f}** | {verdict} |")
    print("\n".join(rows))
    # End-of-report sentinel (r11 ADVICE): bench.py's disposition
    # classifier must distinguish "printed the full report, exit 1 =
    # confirmed regression" from "printed the table header then crashed
    # with Python's default exit 1" — the header alone is not proof the
    # verdict rows ever flushed.
    print("END-OF-RECONCILE-REPORT")
    # Exit contract: a CONFIRMED regression dominates — a mixed run
    # (confirmed regression + an isolate-harness error) must exit 1, not
    # 2, so bench.py keeps the confirmed rows (round-10 ADVICE: worst=2
    # on any isolate error discarded exactly the report this tool
    # exists to produce). Exit 2 is reserved for runs where the harness
    # failed and produced NO confirmed verdict.
    if worst == 1:
        if iso_failed:
            print("\n(partial: some movers could not be isolated — see "
                  "ERROR rows above)")
        return 1
    return 2 if iso_failed else worst


if __name__ == "__main__":
    raise SystemExit(main())
