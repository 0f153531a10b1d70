"""Unit tests for the determinism-audit tooling itself — the audits are
now part of the correctness story (rounding boundaries, LIMIT ties), so
their parsers need the same pinning as any operator."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from audit_limit_ties import split_order_limit  # noqa: E402
from audit_rounding import (  # noqa: E402
    _find_top_level_rounds,
    boundary_distance,
    rewrite_unrounded,
)


# --- rounding audit: round() span parser -------------------------------------


def test_round_parser_simple_and_nested():
    sql = "SELECT round(a + b, 2) AS x, round(round(c, 4) / d, 6) AS y FROM t"
    spans = _find_top_level_rounds(sql)
    # outermost rounds only: the nested round(c, 4) stays inside y's expr
    assert [(s[3]) for s in spans] == [2, 6]
    assert spans[0][2].strip() == "a + b"
    assert "round(c, 4)" in spans[1][2]


def test_round_parser_ignores_identifiers_containing_round():
    sql = "SELECT background, roundtrip, wround(x, 2) FROM t"
    assert _find_top_level_rounds(sql) == []


def test_round_parser_handles_commas_inside_nested_calls():
    sql = "SELECT round(coalesce(a, least(b, c)), 3) FROM t"
    spans = _find_top_level_rounds(sql)
    assert len(spans) == 1
    assert spans[0][3] == 3
    assert spans[0][2].strip() == "coalesce(a, least(b, c))"


def test_rewrite_preserves_positions_and_strips_all():
    sql = "SELECT round(a, 2) AS x, b, round(c / d, 5) AS y FROM t"
    out, ks = rewrite_unrounded(sql)
    assert ks == [2, 5]
    assert "round(" not in out.lower()
    assert out.index("AS x") < out.index("AS y")  # column order intact


def test_boundary_distance_extremes():
    # exactly on the half boundary at k=4
    assert boundary_distance(0.96875, 4) == 0.0
    # dead center between boundaries
    assert abs(boundary_distance(0.12, 2) - 0.5) < 1e-9


# --- LIMIT-tie audit: trailing ORDER BY ... LIMIT parser ---------------------


def test_split_order_limit_basic():
    body, keys, n = split_order_limit(
        "SELECT a, b FROM t ORDER BY a DESC, b ASC LIMIT 20"
    )
    assert n == 20
    assert keys == "a DESC, b ASC"
    assert body.strip().endswith("FROM t")


def test_split_order_limit_takes_trailing_order_by_only():
    sql = """
    WITH x AS (SELECT a FROM t ORDER BY a LIMIT 5)
    SELECT a FROM x ORDER BY a DESC LIMIT 3
    """
    body, keys, n = split_order_limit(sql)
    assert n == 3 and keys == "a DESC"
    # the CTE's inner ORDER BY/LIMIT stays inside the body
    assert "LIMIT 5" in body


def test_split_order_limit_no_limit():
    assert split_order_limit("SELECT a FROM t ORDER BY a") == (None, None, None)


def test_split_order_limit_limit_without_order():
    body, keys, n = split_order_limit("SELECT a FROM t LIMIT 7")
    assert n == 7 and keys is None and body is None
