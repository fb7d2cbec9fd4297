"""Build the adversarially-skewed fixture variant (r6 verdict item 6).

Two planted whales over the sf0.1 tables, written to .benchdata/skew/:

- ``lineitem.parquet``: 50% of rows get ``l_orderkey = 1`` — one join
  key owning half the fact table, the shape that serializes a plain
  shuffle join onto a single reducer. ``orders.parquet`` copied
  unchanged (so the whale key still matches exactly one dim row and
  result cardinality stays equal to the plain fixture's).
- ``documents.parquet``: 80% of docs get a fixed 4-token phrase
  appended — one shingle with document frequency 0.8·N, the stopword
  whale that makes an uncapped shingle-inverted-index pairing emit
  O((0.8N)²) candidate pairs from a single bucket.

Everything else the bench harness needs is read from the source dir
directly. Deterministic (row-position masks, no RNG).

Usage: python tools/make_skewfix.py [src_sf_dir] [out_dir] [fact_whale_frac]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

WHALE_ORDERKEY = 1
FACT_WHALE_FRAC = 0.5
DOC_WHALE_FRAC = 0.8
WHALE_PHRASE = "zzcommon zzshared zzwhale zzshingle"  # one planted 4-gram


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else
               Path(__file__).resolve().parent.parent / ".benchdata" / "skew")
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else FACT_WHALE_FRAC
    out.mkdir(parents=True, exist_ok=True)

    li = pq.read_table(src / "lineitem.parquet")
    n = li.num_rows
    mask = np.arange(n) % 10 < int(round(frac * 10))
    keys = li["l_orderkey"].to_numpy(zero_copy_only=False).copy()
    keys[mask] = WHALE_ORDERKEY
    li = li.set_column(
        li.schema.get_field_index("l_orderkey"), "l_orderkey",
        pa.array(keys, type=li.schema.field("l_orderkey").type),
    )
    pq.write_table(li, out / "lineitem.parquet")

    orders = pq.read_table(src / "orders.parquet")
    pq.write_table(orders, out / "orders.parquet")

    docs = pq.read_table(src / "documents.parquet")
    nd = docs.num_rows
    dmask = pa.array(np.arange(nd) % 10 < int(DOC_WHALE_FRAC * 10))
    text = docs["text"]
    whaled = pc.binary_join_element_wise(
        text, pa.array([WHALE_PHRASE] * nd), " "
    )
    new_text = pc.if_else(dmask, whaled, text)
    docs = docs.set_column(
        docs.schema.get_field_index("text"), "text", new_text.cast(pa.string())
    )
    pq.write_table(docs, out / "documents.parquet")

    print(f"wrote {out}: lineitem {n} rows ({mask.sum()} on whale key "
          f"{WHALE_ORDERKEY}), orders {orders.num_rows} rows, documents "
          f"{nd} rows ({int(DOC_WHALE_FRAC * 100)}% carrying the whale shingle)")


if __name__ == "__main__":
    main()
