"""Divergence capture: dump both engines' sorted value multisets for a query.

When a driver round reports a hash mismatch that does not reproduce locally
(r5 s12_covariance, r7 fe2/t39), the forensic question is always "which
cells differ, and in what representation?".  This tool writes both engines'
full-precision normalized multisets side by side so the next flip is a
one-command diff instead of a hunt:

    python tools/dump_multisets.py <query> [sf_dir] [out_dir]

writes  <out_dir>/<query>.spark.txt  and  <out_dir>/<query>.duck.txt
(one sorted normalized row per line, identical normalization to
tools/check_oracle.py), prints engine/library versions and the first
differing line, and exits 1 on any difference.  out_dir defaults to
/tmp/multisets.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

from tools.check_oracle import df_to_multiset, duck_connection  # noqa: E402


def dump(name: str, sf_dir: str, out_dir: str) -> int:
    import duckdb
    import pyspark

    import __spark_entry__ as e
    from martech_pipelines_spark import get_spark

    print(f"pyspark={pyspark.__version__} duckdb={duckdb.__version__}")
    qs, oracles = e.queries(), e.oracle_sql()
    if name not in qs:
        print(f"unknown query: {name}")
        return 2
    if name not in oracles:
        print(f"{name} is rows-only (no oracle) — nothing to diff")
        return 2

    spark = get_spark("dump_multisets")
    sdf = qs[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    cur = con.execute(oracles[name])
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for tag, cols, rows in (("spark", s_cols, s_rows), ("duck", d_cols, d_rows)):
        ms = df_to_multiset(cols, rows)
        lines = sorted(
            f"{row!r} x{cnt}" if cnt > 1 else repr(row)
            for row, cnt in ms.items()
        )
        path = os.path.join(out_dir, f"{name}.{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# cols(sorted)={sorted(cols)}\n")
            fh.write("\n".join(lines) + "\n")
        paths[tag] = (path, lines)
        print(f"  wrote {path} ({len(rows)} rows, {len(lines)} distinct)")

    sp_lines, du_lines = paths["spark"][1], paths["duck"][1]
    if sp_lines == du_lines and sorted(s_cols) == sorted(d_cols):
        print("  IDENTICAL multisets")
        return 0
    if sorted(s_cols) != sorted(d_cols):
        print(f"  SCHEMA differs: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    for i, (a, b) in enumerate(zip(sp_lines, du_lines)):
        if a != b:
            print(f"  first diff at sorted line {i}:\n    spark: {a}\n    duck:  {b}")
            break
    else:
        if len(sp_lines) != len(du_lines):
            print(f"  line counts differ: spark={len(sp_lines)} duck={len(du_lines)}")
    return 1


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/multisets"
    return dump(name, sf_dir, out_dir)


if __name__ == "__main__":
    raise SystemExit(main())
