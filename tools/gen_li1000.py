"""Generate the 1000x GRAPH rung inputs (r7 verdict #7): lineitem,
orders, customer replicated 1000x from sf0.1 (600M / 150M / 15M rows)
into testdata_li1000/ — the three tables graph_degree_stats,
graph_two_hop, and graph_kcore read. Reuses gen_scaled's per-copy key
offsetting (each copy is an independent sf0.1 instance; copies never
join to each other, so graph structure scales linearly, not densely).

Usage: python tools/gen_li1000.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import duckdb
from gen_scaled import copy_select

TABLES = ("lineitem", "orders", "customer")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_li1000"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # Two constraints shape the write: a single 1000-way UNION ALL
    # trips DuckDB's expression-depth cap, and materializing 600M rows
    # into an in-memory table risks OOM. So each 50-copy batch COPYs
    # straight to its own part file under a {table}.parquet DIRECTORY
    # — Spark reads the directory transparently, and nothing is ever
    # held in memory beyond one batch's stream.
    batch = 50
    for table in TABLES:
        dest = os.path.join(out_dir, f"{table}.parquet")
        os.makedirs(dest, exist_ok=True)
        for n, lo in enumerate(range(0, copies, batch)):
            union = " UNION ALL ".join(
                copy_select(table, i) for i in range(lo, min(lo + batch, copies))
            )
            con.execute(
                f"COPY ({union}) TO '{dest}/part{n:04d}.parquet' (FORMAT PARQUET)"
            )
        rows = con.execute(f"SELECT count(*) FROM '{dest}/*.parquet'").fetchone()[0]
        print(f"{table}: {rows} rows -> {dest}", flush=True)


if __name__ == "__main__":
    main()
