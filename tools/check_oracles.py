"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row counts and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(rows, columns):
    """Type-strict normalization: the driver hashes raw values, so a
    DoubleType 600.0 and a BIGINT 600 must NOT normalize to the same
    token (that exact masking cost a round — VERDICT r2). Floats keep a
    float-shaped token ("600.0"), ints stay bare ("600")."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                v = f"bool:{v}"
            elif isinstance(v, float):
                if math.isnan(v):
                    v = "float:nan"
                else:
                    s = f"{v:.9g}"
                    if "." not in s and "e" not in s and "n" not in s:
                        s += ".0"
                    v = f"float:{s}"
            elif isinstance(v, int):
                v = f"int:{v}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from clkhash_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(app_name="oracle-check", cores=16,
                          shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for table in TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {table} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        start = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - start
        if name not in oracles:
            print(f"  {name}: rows-only rows={len(srows)} "
                  f"({spark_s:.1f}s spark)")
            continue
        start = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        duck_s = time.time() - start
        ok_schema = sorted(scols) == sorted(ocols)
        sn = normalize(srows, scols)
        on = normalize(orows, ocols)
        ok = ok_schema and sn == on
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} rows={len(srows)}/{len(orows)} "
              f"({spark_s:.1f}s spark / {duck_s:.1f}s duck)")
        if not ok:
            failures += 1
            if not ok_schema:
                print(f"    schema: spark={sorted(scols)} "
                      f"duck={sorted(ocols)}")
            else:
                diff_a = [r for r in sn if r not in set(on)][:3]
                diff_b = [r for r in on if r not in set(sn)][:3]
                print(f"    spark-only: {diff_a}")
                print(f"    duck-only:  {diff_b}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
