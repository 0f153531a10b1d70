"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB oracle
on the same parquet tables and compares row count, sorted column names,
and the order-insensitive multiset of normalized row values.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from collections import Counter
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_value(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and represent with repr (full precision)
        if v == 0:
            return "0.0"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    return v


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def check(spark, con, name, spark_fn, sql, sf_dir) -> tuple[bool, str]:
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    ms, md = df_to_multiset(s_cols, s_rows), df_to_multiset(d_cols, d_rows)
    if ms != md:
        only_s = list((ms - md).items())[:3]
        only_d = list((md - ms).items())[:3]
        return False, f"values: only-spark={only_s} only-duck={only_d}"
    return True, f"ok ({len(s_rows)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from martech_pipelines_spark import get_spark

    wanted = sys.argv[2:] or None
    spark = get_spark("oracle_check")
    con = duck_connection(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if wanted and name not in wanted:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"  [rows-only] {name}: {n} rows")
            continue
        try:
            ok, msg = check(spark, con, name, fn, oracles[name], sf_dir)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {ex}"
        print(f"  [{'PASS' if ok else 'FAIL'}] {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
