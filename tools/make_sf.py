"""Deterministic scale-up synthesizer (VERDICT r4 "next round" item 1).

Builds an sf1-equivalent dataset from /root/testdata/sf0.1 by replicating
every fact table ``copies`` times with a single uniform key stride added to
EVERY key column (1e8 >> any sf0.1 key), so all cross-table key
relationships — o_custkey→customer, l_orderkey→orders, vec_id↔doc_id —
hold within each replica exactly as they do in the original. Dimension
tables (region, nation) and all non-key attributes are unchanged, so the
data keeps the original's value distributions, hosts, languages, and text:
at 10x the judge-relevant stress is exactly where it should be — group
counts, shuffle widths, dup-cluster sizes, and quadratic-guard caps.

No randomness and no clock reads: output is a pure function of the input
parquet, so Spark and the DuckDB oracle read byte-identical tables.

Single parquet FILES (not directories) with 128 Ki-row row groups: DuckDB's
``read_parquet('{t}.parquet')`` needs a file, and Spark still parallelizes
a single file by splitting at row-group boundaries.

Usage: python tools/make_sf.py [out_dir] [copies] [src_dir]
       (defaults: /dev/shm/sf1 10 /root/testdata/sf0.1)
"""

from __future__ import annotations

import pathlib
import sys

STRIDE = 100_000_000  # uniform for every key column, any copies <= 90

# table -> list of key columns that get `+ k * STRIDE`
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ["region", "nation"]


def synthesize(out_dir: str, copies: int, src_dir: str) -> None:
    import duckdb

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in DIM_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src_dir}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEY_COLS.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src_dir}/{t}.parquet')"
            ).fetchall()
        ]
        select = ", ".join(
            f"{c} + k * {STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} "
            f"FROM read_parquet('{src_dir}/{t}.parquet'), range({copies}) t(k) "
            f"ORDER BY k, {keys[0]}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)"
        )
    for t in DIM_TABLES + list(KEY_COLS):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    if any(a in ("-h", "--help") for a in sys.argv[1:]) or any(
        a.startswith("-") for a in sys.argv[1:]
    ):
        print(__doc__ or "usage: make_sf.py [out_dir] [copies] [src_dir]")
        print("usage: make_sf.py [out_dir=/dev/shm/sf1] [copies=10] [src_dir=/root/testdata/sf0.1]")
        sys.exit(0)
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    synthesize(out_dir, copies, src_dir)
