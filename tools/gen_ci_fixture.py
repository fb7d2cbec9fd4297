"""Generate the minimal parquet fixture the CI e2e job needs.

The sandboxed dev environment ships driver-generated fixtures at
/root/testdata/sf*; CI runners do not. tests/test_e2e_postgres_kafka.py
exercises the wire path (Postgres -> engine -> Kafka) against whatever
`orders` fixture SPARK_GRAFT_TEST_SF_DIR points at — the assertion is
round-trip parity against the parquet itself, not against golden values
— so any deterministic TPC-H-shaped `orders` table works.

Usage: python tools/gen_ci_fixture.py <out_dir> [rows]
Writes <out_dir>/orders.parquet (default 1500 rows, seeded RNG) and
<out_dir>/lineitem.parquet (~4x rows) — the two tables the CLI's
DEMO_ENTITIES job (plans/spec.py:156-175) reads, so the workflow's
container-free dry-run job can boot the whole engine on this fixture.
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


def gen_lineitem(n_orders: int = 1500, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    lines_per_order = rng.integers(1, 8, size=n_orders)
    orderkey = np.repeat(np.arange(1, n_orders + 1, dtype=np.int64), lines_per_order)
    n = len(orderkey)
    linenumber = np.concatenate(
        [np.arange(1, k + 1, dtype=np.int64) for k in lines_per_order]
    )
    suppkey = rng.integers(1, max(2, n_orders // 15), size=n, dtype=np.int64)
    status = np.array(["O", "F"])[rng.integers(0, 2, size=n)]
    base = datetime(1995, 1, 1)
    ship = [base + timedelta(days=int(d)) for d in rng.integers(0, 2000, size=n)]
    return pa.table(
        {
            "l_orderkey": orderkey,
            "l_linenumber": linenumber,
            "l_suppkey": suppkey,
            "l_linestatus": status,
            "l_shipdate": pa.array(ship, type=pa.timestamp("us")),
            "l_quantity": np.round(rng.uniform(1, 50, size=n), 2),
        }
    )


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "ci-testdata/sf0.001")
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    out.mkdir(parents=True, exist_ok=True)
    pq.write_table(gen_orders(rows), out / "orders.parquet")
    li = gen_lineitem(rows)
    pq.write_table(li, out / "lineitem.parquet")
    print(f"wrote {out/'orders.parquet'} ({rows} rows)")
    print(f"wrote {out/'lineitem.parquet'} ({li.num_rows} rows)")


if __name__ == "__main__":
    main()
