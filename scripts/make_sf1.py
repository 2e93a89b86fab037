"""Synthesize a deterministic sf1.0 dataset under data/sf1.0/ for the
one-off scale stress pass (round-4 verdict item 6).

The driver's read-only testdata stops at sf0.1, so sf1.0 is derived from it
deterministically — 10 key-offset copies per fact table — with two deliberate
semantic choices that make the copies a *harder* input than naive replication:

  * events: copies keep the SAME user_id but shift ts by copy * 31 days, so
    every user's event sequence is 10x DEEPER (stresses sessionize /
    running-window state growth, which per-copy user offsets would not);
  * documents: copies append a ' cp<c>' marker to the text, so near-dup
    structure is preserved WITHIN each copy but copies don't form 10-cliques
    (exact cross-copy duplicates would blow pair queries up quadratically and
    measure the blowup, not the engine).

Dimension tables (region, nation) are constants and stay as-is; all other
key columns get copy * 1e10 offsets, preserving referential integrity and
per-key distributions. Correctness comparisons are unaffected by any of
these choices: Spark and DuckDB read the SAME parquet files.

Fixture-side scale (images, blocks, eav, xml, audio, embeddings-with-dups)
is independent of these tables — it keys off the sf-dir NAME, so sf1.0
means n_images = 1,060,000 there regardless.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, "data", "sf1.0")
COPIES = 10
STRIDE = 10_000_000_000  # far above any sf0.1 key; keeps int64 comfortable

# per-table key columns to offset by copy * STRIDE (dimension FKs into
# nation/region deliberately NOT offset — those tables are not replicated)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "embeddings": ["vec_id"],
}
ASIS = ["region", "nation"]


def _cols(con, table: str) -> list[str]:
    return [
        r[0]
        for r in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()
    ]


def make(dst: str = DST) -> str:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ASIS:
        out = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(out):
            con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}' (FORMAT PARQUET)")
    for t, keys in KEYED.items():
        out = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(out):
            continue
        sel = ", ".join(
            f"{c} + c * {STRIDE} AS {c}" if c in keys else c for c in _cols(con, t)
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', range({COPIES}) r(c) "
            f"ORDER BY c, {keys[0]}) TO '{out}' (FORMAT PARQUET)"
        )
    # events: same users, 10x deeper per-user sequences (31-day shift / copy)
    out = os.path.join(dst, "events.parquet")
    if not os.path.exists(out):
        sel = (
            f"event_id + c * {STRIDE} AS event_id, "
            "ts + INTERVAL (31 * c) DAY AS ts, "
            "user_id, event_type, value, props"
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/events.parquet', range({COPIES}) r(c) "
            f"ORDER BY c, event_id) TO '{out}' (FORMAT PARQUET)"
        )
    # documents: per-copy text marker so copies never cross-duplicate
    out = os.path.join(dst, "documents.parquet")
    if not os.path.exists(out):
        sel = (
            f"doc_id + c * {STRIDE} AS doc_id, "
            "CASE WHEN c = 0 THEN text ELSE text || ' cp' || c END AS text, "
            "lang, source, "
            "CAST(length(CASE WHEN c = 0 THEN text ELSE text || ' cp' || c END) AS BIGINT) AS n_chars"
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/documents.parquet', range({COPIES}) r(c) "
            f"ORDER BY c, doc_id) TO '{out}' (FORMAT PARQUET)"
        )
    return dst


if __name__ == "__main__":
    d = make(sys.argv[1] if len(sys.argv) > 1 else DST)
    con = duckdb.connect()
    for t in ASIS + list(KEYED) + ["events", "documents"]:
        n = con.execute(f"SELECT count(*) FROM '{d}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    print(d)
