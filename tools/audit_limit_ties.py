"""Ambiguous top-N cut audit — the second latent cross-engine fragility
class after rounding boundaries (tools/audit_rounding.py).

A query ending in ``ORDER BY ... LIMIT N`` has an ENGINE-DEPENDENT result
whenever the rows at ranks N and N+1 compare equal on the full ORDER BY
key: both engines satisfy the SQL, but each may keep a different row, and
Spark's pick can additionally vary with partitioning — the same
environment-flip mode that broke s12.  Most corpus queries already break
ties with a unique id column; this audit CHECKS that instead of trusting
docstrings.

For every oracle containing a top-level LIMIT:

1. parse the trailing ``ORDER BY <keys> LIMIT <n>``;
2. run the oracle without the LIMIT, projecting only the sort keys;
3. compare the key tuples at ranks N and N+1 — equal keys = FLAG.

Queries whose LIMIT is not preceded by ORDER BY are flagged outright
(nondeterministic row choice).  Exits 1 on any flag.

Usage:  python tools/audit_limit_ties.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def split_order_limit(sql: str):
    """Returns (body, order_keys, n) for a trailing ORDER BY...LIMIT, or
    (None, None, n) when LIMIT exists without a trailing ORDER BY, or
    (None, None, None) when there is no top-level LIMIT."""
    m = re.search(r"\blimit\s+(\d+)\s*$", sql.strip(), re.IGNORECASE)
    if not m:
        return None, None, None
    n = int(m.group(1))
    head = sql.strip()[: m.start()].rstrip()
    om = re.search(r"\border\s+by\b(?P<keys>(?:.(?!\border\s+by\b))*)$",
                   head, re.IGNORECASE | re.DOTALL)
    if not om:
        return None, None, n
    keys = om.group("keys").strip()
    body = head[: om.start()].rstrip()
    return body, keys, n


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _strip_markers(keys: str) -> list[str]:
    parts = [p.strip() for p in keys.split(",")]
    return [
        re.sub(
            r"\b(asc|desc)\b|\bnulls\s+(first|last)\b", "", p,
            flags=re.IGNORECASE,
        ).strip()
        for p in parts
    ]


def audit(con, name: str, sql: str):
    body, keys, n = split_order_limit(sql)
    if n is None:
        return None  # no LIMIT — not this audit's concern
    if keys is None:
        return (name, n, "LIMIT without trailing ORDER BY", None)
    key_exprs = _strip_markers(keys)

    def probe_with(projection: str, order: str):
        return con.execute(
            f"SELECT {projection} FROM ({body}) __t ORDER BY {order} "
            f"LIMIT 2 OFFSET {n - 1}"
        ).fetchall()

    # 1) keys verbatim; 2) table prefixes stripped (aliases like
    # n.common_neighbors resolve to the projected name)
    for xform in (lambda s: s, lambda s: re.sub(r"\b\w+\.", "", s)):
        try:
            proj = ", ".join(xform(k) for k in key_exprs)
            order = xform(keys)
            rows = probe_with(proj, order)
            break
        except duckdb.BinderException:
            rows = None
    else:
        rows = None
    if rows is None:
        # 3) conservative fallback: compare only the keys that resolve
        # to projected output columns.  A strict difference on ANY
        # subset key implies the full key tuple differs (deterministic
        # cut); a subset tie is reported for manual verification.
        out_cols = [d[0] for d in con.execute(f"SELECT * FROM ({body}) LIMIT 0").description]
        resolvable = [
            re.sub(r"\b\w+\.", "", k) for k in key_exprs
            if re.sub(r"\b\w+\.", "", k) in out_cols
        ]
        if not resolvable:
            return (name, n, "UNRESOLVABLE ORDER KEYS (manual)", None)
        mod = re.sub(
            r"\blimit\s+\d+\s*$", f"LIMIT {n + 1}", sql.strip(),
            flags=re.IGNORECASE,
        )
        cur = con.execute(mod)
        cols = [d[0] for d in cur.description]
        allrows = cur.fetchall()
        if len(allrows) <= n:
            return (name, n, "ok (result smaller than LIMIT)", None)
        idx = [cols.index(k) for k in resolvable]
        a = tuple(allrows[n - 1][i] for i in idx)
        b = tuple(allrows[n][i] for i in idx)
        return (
            name, n,
            "ok (subset keys differ)" if a != b else "SUBSET-KEY TIE (manual)",
            a if a == b else None,
        )
    if len(rows) < 2:
        return (name, n, "ok (result smaller than LIMIT)", None)
    if rows[0] == rows[1]:
        return (name, n, "TIE AT CUT", rows[0])
    return (name, n, "ok", None)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wanted = set(sys.argv[2:]) or None
    sys.path.insert(0, ".")
    import __spark_entry__ as e

    con = duck_connection(sf_dir)
    flagged = []
    checked = 0
    for name, sql in e.oracle_sql().items():
        if wanted and name not in wanted:
            continue
        try:
            r = audit(con, name, sql)
        except Exception as ex:  # noqa: BLE001
            print(f"  [ERR] {name}: {type(ex).__name__}: {ex}")
            flagged.append((name, None, f"audit error: {ex}", None))
            continue
        if r is None:
            continue
        checked += 1
        name_, n, status, key = r
        print(f"  {name_} (LIMIT {n}): {status}" + (f" key={key}" if key else ""))
        if "ok" not in status:
            flagged.append(r)
    print(f"\n{checked} LIMIT queries checked, {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
