"""Dump .explain("formatted") for named queries to plans/r12/<query>_<tag>.txt.

Usage:  python tools/explain_to_file.py <tag> query [query ...]
        (tag is e.g. "before" or "after"; sf dir from $SPARK_GRAFT_SF_DIR,
        default sf0.1 — the bench tier, so plan shapes match the measured runs)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(out_dir, exist_ok=True)

    from martech_pipelines_spark import caching, get_spark
    from martech_pipelines_spark.plans import QUERIES

    spark = get_spark("explain")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        caching.release()
    spark.stop()


if __name__ == "__main__":
    main()
