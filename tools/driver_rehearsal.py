"""Dress rehearsal of the driver's t2 gate.

Unlike tools/check_oracle.py (which runs under the engine's get_spark
session), this uses a completely BARE ``SparkSession.builder.master(...)
.getOrCreate()`` — exactly what the correctness driver does — so any
query that silently depends on a get_spark conf (ANSI mode, shuffle
partitions, arrow flags, ...) fails HERE instead of in the round's
CORRECTNESS_r{N}.json.  Round 6 ran this on the full 50-slot window:
50/50 PASS.

Usage:  python tools/driver_rehearsal.py [n_queries] [offset]
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from collections import Counter
import duckdb
from pyspark.sql import SparkSession
from tools_common import norm_value

SF = "/root/testdata/sf0.01"
spark = SparkSession.builder.master("local[32]").getOrCreate()
import __spark_entry__ as e

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = e.queries(), e.oracle_sql()
n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
off = int(sys.argv[2]) if len(sys.argv) > 2 else 0
names = [x for x in list(qs)[off:off + n] if x in oracles]
fails = []
for name in names:
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
        if ok:
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ms = Counter(tuple(norm_value(r[i]) for i in so) for r in srows)
            md = Counter(tuple(norm_value(r[i]) for i in do) for r in drows)
            ok = ms == md
        print(("PASS " if ok else "FAIL ") + name, flush=True)
        if not ok:
            fails.append(name)
    except Exception as ex:
        print(f"ERR  {name}: {type(ex).__name__}: {ex}", flush=True)
        fails.append(name)
print(f"\n{len(fails)} failures: {fails}")
sys.exit(1 if fails else 0)
