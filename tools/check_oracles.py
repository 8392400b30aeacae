"""Driver-mimic: run every queries() entry on Spark and its oracle_sql() on
DuckDB at the given sf dir; compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# Python types that only DuckDB can produce here (HUGEINT -> int is fine, but
# Decimal means the oracle's type differs from Spark's and the driver's value
# hash will diverge even when the numbers are equal).
HAZARD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def norm_cell(v):
    """Type-tagged serialization: int vs float vs Decimal hash differently,
    mimicking the driver's stricter value hash (VERDICT r1: the old version
    normalized DuckDB HUGEINT sums to the same string as Spark BIGINT and hid
    4 driver-level hash mismatches)."""
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        out = f"{v:.6f}".rstrip("0").rstrip(".")
        if out == "-0":  # -1e-8 and 1e-8 are equal at 6dp; so are -0.0/0.0
            out = "0"
        return "f:" + out
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        # NOTE: PySpark collect() renders TimestampType in the HOST zone
        # regardless of spark.sql.session.timeZone — timestamp-returning
        # queries must pre-cast to epoch BIGINT (every current one does)
        return "t:" + v.isoformat()
    return "s:" + str(v)


def _esc(cell: str) -> str:
    """Make the cell/row separators unambiguous: without escaping, the row
    ('a|b','c') and ('a','b|c') serialize identically and a real engine
    divergence hashes as OK."""
    return cell.replace("\\", "\\\\").replace("|", "\\|").replace("\n", "\\n")


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_esc(norm_cell(r[i])) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def attribute_parts(scols, srows, ocols, orows):
    """Bisect a suite-level mismatch down to its failing part(s) WITHOUT
    re-executing anything (VERDICT r4 "what's wrong" item 2): the suite
    queries carry a ``part`` column in both engines' results, so the
    already-collected rows are grouped by part value and each group is
    hashed separately. Returns ``[(part, spark_rows, oracle_rows,
    hash_equal), ...]`` for parts that differ, or ``None`` when the result
    has no ``part`` column (non-suite query)."""
    if "part" not in scols or "part" not in ocols:
        return None
    si, oi = scols.index("part"), ocols.index("part")
    sg: dict = {}
    og: dict = {}
    for r in srows:
        sg.setdefault(r[si], []).append(r)
    for r in orows:
        og.setdefault(r[oi], []).append(r)
    bad = []
    for p in sorted(set(sg) | set(og), key=str):
        a, b = sg.get(p, []), og.get(p, [])
        heq = frame_hash(scols, a) == frame_hash(ocols, b)
        if len(a) != len(b) or not heq:
            bad.append((p, len(a), len(b), heq))
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # env overrides for scale-up oracle runs (the sf1 battery collects
    # ~10x the rows of the sf0.01 driver run; default 8/2g matches the
    # driver's shape)
    cpus = os.environ.get("SPARK_ORACLE_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle_check")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_ORACLE_DRIVER_MEM", "2g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo here used to run ZERO checks and exit green — the one
        # failure mode a verification tool must not have
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_spark = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only) — {len(srows)} rows")
            continue
        t_spark = time.monotonic() - t_spark
        t_duck = time.monotonic()
        try:
            rel = con.sql(sql)
            ocols = list(rel.columns)
            otypes = [str(t).upper() for t in rel.types]
            orows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {exc}")
            continue
        hazards = [
            f"{c}:{t}"
            for c, t in zip(ocols, otypes)
            if any(h in t for h in HAZARD_TYPES)
        ]
        if hazards:
            failures.append(name)
            print(
                f"FAIL {name}: oracle emits driver-hash-hazard types {hazards} "
                f"(cast to BIGINT/DOUBLE in the SQL)"
            )
            continue
        t_duck = time.monotonic() - t_duck  # duckdb cost only, not hashing
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = frame_hash(scols, srows)
        oh = frame_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK  " if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} cols={'=' if ok_cols else f'{scols} vs {ocols}'} hash={'=' if ok_hash else f'{sh[:8]} vs {oh[:8]}'} (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
        )
        if status == "FAIL" and ok_cols:
            # suite queries: name the failing part(s) from the collected
            # rows — no re-execution needed, the part column is in-row
            parts = attribute_parts(scols, srows, ocols, orows)
            if parts:
                for p, na, nb, heq in parts:
                    print(
                        f"    part {p}: rows {na}/{nb} "
                        f"hash={'=' if heq else '!='}"
                    )
        if not ok_hash and ok_cols and ok_count:
            # show first differing rows for debug
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            aset = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
            bset = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
            diffs = [(a, b) for a, b in zip(aset, bset) if a != b][:3]
            for a, b in diffs:
                print(f"    spark : {a[:160]}")
                print(f"    duckdb: {b[:160]}")
    print()
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
