"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf, compare
row-count, column names, and order-insensitive values.

Usage: python tools/verify_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from zerox_spark.session import get_spark

    spark = get_spark("local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:20s} rows-only: {len(srows)} rows")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        sn = normalize(srows, scols)
        on = normalize(orows, ocols)
        ok_vals = sn == on
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:20s} {status} spark={len(srows)} oracle={len(orows)} "
            f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'}"
        )
        if not ok_vals and ok_cols:
            sset, oset = set(sn), set(on)
            for x in list(sset - oset)[:2]:
                print("   spark-only:", x[:220])
            for x in list(oset - sset)[:2]:
                print("   oracle-only:", x[:220])
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
