"""Local emulation of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf dir, compare row count, column
names, and order-insensitive value multisets (columns sorted by name, like
the driver's value-hash).

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from goprowl_spark.session import get_spark

    spark = get_spark("contract-check", cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: {len(rows)} rows (rows-only, no oracle) [{dt:.1f}s]")
            if not rows:
                print(f"      WARNING: empty result")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            otypes = [str(t) for t in res.types]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: oracle sql error")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        # The driver's value hash is type-sensitive: a DuckDB column that
        # silently promotes (HUGEINT from window sums over BIGINT, DECIMAL
        # from integer division) will hash-mismatch Spark's BIGINT/DOUBLE
        # even when the values agree. Catch the whole class here.
        promoted = [
            f"{c}:{t}" for c, t in zip(ocols, otypes)
            if "HUGEINT" in t or t.startswith("DECIMAL")
        ]
        if promoted:
            problems.append(
                f"oracle type promotion (add explicit CAST): {promoted}"
            )
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} oracle={len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema spark={sorted(cols)} oracle={sorted(ocols)}")
        if not problems:
            a, b = normalize(rows, cols), normalize(orows, ocols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{dt:.1f}s]")
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(rows)} rows [{dt:.1f}s]")
    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all contract queries consistent")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
