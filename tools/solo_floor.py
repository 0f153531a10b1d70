"""Solo floor measurement for headline candidates.

Runs each named query ALONE (fresh lineage, caches released between
runs) best-of-N at the bench scale factor with the bench warm-up, and
prints the calib probe next to the results so floor provenance can be
judged against the floor-setting environment (BENCH_BASELINE.json
["calib"]).  This is the protocol BENCH_NOTES floors cite.

Usage:  python tools/solo_floor.py [--n 5] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 5
    if args and args[0] == "--n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from martech_pipelines_spark import caching, get_spark
    from martech_pipelines_spark.plans import QUERIES

    spark = get_spark("solo_floor")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # best-of-3, matching bench.py's probe exactly — a single cold run
    # pays whole-stage codegen compilation and overstates calib ~3x
    # (round-9 finding), which would misclassify a healthy host.
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(30_000_000)
            .selectExpr("xxhash64(id) % 1000 AS b", "id")
            .groupBy("b")
            .agg({"id": "sum"})
            .count()
        )
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"calib {best:.3f}")

    for name in args:
        fn = QUERIES[name]
        best = None
        for _ in range(n):
            caching.release()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        print(f"{name} best-of-{n} {best:.3f}")


if __name__ == "__main__":
    main()
