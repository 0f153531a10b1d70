"""Local replica of the driver's t2 gate: every corpus query vs DuckDB.

Runs at sf0.001 for speed (the driver runs sf0.01; tools/check_oracle.py
runs any sf on demand).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_oracle import check, duck_connection  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "event_id", "ts_str", "event_type", "value_paise", "k"]


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn = _QUERIES[name]
    if name not in _ORACLES:
        assert fn(spark, SF_DIR).count() >= 0  # rows-only check
        return
    ok, msg = check(spark, duck, name, fn, _ORACLES[name], SF_DIR)
    assert ok, msg
