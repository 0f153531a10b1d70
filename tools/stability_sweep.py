"""Partition-count stability sweep — simulate the driver-environment
flip locally.

The s12 failure proved a query can pass every local oracle check and
still hash-differently in the driver: Spark's result there is produced
under a different partitioning/summation order.  This sweep runs each
query's SPARK side under two different ``spark.sql.shuffle.partitions``
settings (the dominant source of summation-order variation) and
compares the normalized value multisets — any difference is a
nondeterminism bug that WILL eventually flip a driver hash, whatever
today's oracle run says.

Usage:  python tools/stability_sweep.py [sf_dir] [n_queries | query ...]
        (default: sf0.01, the first 50 registry entries — the driver
        window)
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools_common import norm_value  # noqa: E402  (same contract as check_oracle)


def multiset(df) -> Counter:
    cols = sorted(range(len(df.columns)), key=lambda i: df.columns[i])
    return Counter(
        tuple(norm_value(r[i]) for i in cols) for r in (tuple(x) for x in df.collect())
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from martech_pipelines_spark import caching, get_spark
    from martech_pipelines_spark.plans import QUERIES

    args = sys.argv[2:]
    if len(args) == 1 and args[0].isdigit():
        names = list(QUERIES)[: int(args[0])]
    elif args:
        names = args
    else:
        names = list(QUERIES)[:50]

    spark = get_spark("stability_sweep", shuffle_partitions=32)
    failures = []
    for name in names:
        fn = QUERIES[name]
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = multiset(fn(spark, sf_dir))
            caching.release()
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = multiset(fn(spark, sf_dir))
            caching.release()
        except Exception as ex:  # noqa: BLE001
            print(f"  [ERR] {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if a != b:
            only_a = list((a - b).items())[:2]
            only_b = list((b - a).items())[:2]
            print(f"  [UNSTABLE] {name}: 32p-only={only_a} 7p-only={only_b}")
            failures.append(name)
        else:
            print(f"  [stable] {name} ({sum(a.values())} rows)")
    print(f"\n{len(failures)} unstable/err: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
