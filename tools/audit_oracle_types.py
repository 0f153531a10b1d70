"""Audit: no oracle may emit a DuckDB type outside the comparator's safe set.

Root-cause class found in round 7: `sum(<BIGINT>)` in DuckDB returns
HUGEINT (INT128).  Locally the comparator normalizes it fine, but a
different driver-side DuckDB/pandas version can stringify HUGEINT
differently than BIGINT (object dtype, Decimal repr, float widening) —
and the ONLY two r7 driver hash flips (fe2_multiwindow_features,
t39_tokenizer_fertility) were exactly the two oracles with naked integer
sums.  The fix is always `CAST(sum(...) AS BIGINT)`; this audit keeps the
construct out of the corpus permanently.

Flags, per oracle output column:
  - HUGEINT / UHUGEINT          (the r7 flip class)
  - DECIMAL with precision > 18 (would exceed int64 on the pandas path)

Usage:  python tools/audit_oracle_types.py [sf_dir]
Exit 1 if anything is flagged.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

from tools.check_oracle import TABLES  # noqa: E402


def main() -> int:
    import duckdb

    import __spark_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = e.oracle_sql()
    flagged: dict[str, list[tuple[str, str]]] = {}
    for name, sql in oracles.items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
            bad = []
            for col, ty in zip(rel.columns, rel.types):
                ts = str(ty).upper()
                if "HUGEINT" in ts:
                    bad.append((col, ts))
                else:
                    m = re.match(r"DECIMAL\((\d+)", ts)
                    if m and int(m.group(1)) > 18:
                        bad.append((col, ts))
            if bad:
                flagged[name] = bad
        except Exception as ex:  # noqa: BLE001
            flagged[name] = [("BIND-ERROR", f"{type(ex).__name__}: {ex}"[:140])]

    print(
        f"audit_oracle_types: {len(oracles)} oracles scanned "
        f"(duckdb {duckdb.__version__}), {len(flagged)} flagged"
    )
    for name, bad in flagged.items():
        for col, ts in bad:
            print(f"  [FLAG] {name}.{col}: {ts}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
