"""Self-check that mimics the driver's correctness gate: run every
queries() entry at a given sf dir, compare row count / column names /
order-insensitive values against oracle_sql() via DuckDB.

Usage: python tools/verify_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from sage_spark.session import build_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_spark(app_name="verify-entry")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # the FULL registry (driver's 50-slot window + rotated-out queries):
    # rotation out of the window must never drop a query from CI checking
    queries = entrymod.queries_all()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(spark_rows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_types = [str(t).upper() for t in rel.types]
            duck_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        # The driver hashes typed values: a DuckDB HUGEINT/INT32/DECIMAL where
        # Spark emits BIGINT/DOUBLE hash-mismatches even when values are equal
        # (the round-2 corpus_stats_by_source lesson). Flag width mismatches.
        spark_types = dict(df.dtypes)
        type_warn = []
        # Array/struct/map contract columns crash the driver's hasher outright
        # (pandas can't factorize list cells — the round-3 retrieval_trace red).
        # Serialize them (array_join / to_json) before they leave the contract.
        for c, st in spark_types.items():
            if st.startswith(("array", "struct", "map")):
                type_warn.append((c, st, "non-scalar contract column"))
        for c, dt in zip(duck_cols, duck_types):
            st = spark_types.get(c, spark_types.get(c.lower(), ""))
            # HUGEINT/DECIMAL leave pandas' int64 fast path (object/float64),
            # which is what broke corpus_stats_by_source in round 2; plain
            # int-width differences (int32 vs int64) hash identically.
            if st == "bigint" and dt in ("HUGEINT", "UBIGINT"):
                type_warn.append((c, st, dt))
            if st == "double" and (dt.startswith("DECIMAL") or dt == "FLOAT"):
                type_warn.append((c, st, dt))
        if type_warn:
            print(f"FAIL  {name}: oracle/spark type-width mismatch (driver hash risk): {type_warn}")
            failures += 1
            continue
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            print(f"FAIL  {name}: columns {spark_cols} vs {duck_cols}")
            failures += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL  {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            failures += 1
            continue
        a = _normalize(spark_rows, [c.lower() for c in spark_cols])
        b = _normalize(duck_rows, [c.lower() for c in duck_cols])
        if a != b:
            bad = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
            continue
        print(f"ok    {name}: {len(spark_rows)} rows, values match")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
