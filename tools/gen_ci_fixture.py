"""Generate the minimal parquet fixture the CI e2e job needs.

The sandboxed dev environment ships driver-generated fixtures at
/root/testdata/sf*; CI runners do not. tests/test_e2e_postgres_kafka.py
exercises the wire path (Postgres -> engine -> Kafka) against whatever
`orders` fixture SPARK_GRAFT_TEST_SF_DIR points at — the assertion is
round-trip parity against the parquet itself, not against golden values
— so any deterministic TPC-H-shaped `orders` table works.

Usage: python tools/gen_ci_fixture.py <out_dir> [rows]
Writes <out_dir>/orders.parquet (default 1500 rows, seeded RNG).
"""

from __future__ import annotations

import sys
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def gen_orders(n: int = 1500, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    orderkey = np.arange(1, n + 1, dtype=np.int64)
    custkey = rng.integers(1, max(2, n // 10), size=n, dtype=np.int64)
    status = np.array(["O", "F", "P"])[rng.integers(0, 3, size=n)]
    base = datetime(1995, 1, 1)
    dates = [base + timedelta(days=int(d)) for d in rng.integers(0, 2000, size=n)]
    return pa.table(
        {
            "o_orderkey": orderkey,
            "o_custkey": custkey,
            "o_orderstatus": status,
            "o_orderdate": pa.array(dates, type=pa.timestamp("us")),
            "o_totalprice": np.round(rng.uniform(900, 500_000, size=n), 2),
        }
    )


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "ci-testdata/sf0.001")
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    out.mkdir(parents=True, exist_ok=True)
    pq.write_table(gen_orders(rows), out / "orders.parquet")
    print(f"wrote {out/'orders.parquet'} ({rows} rows)")


if __name__ == "__main__":
    main()
