"""Shared helpers for the tools/ audit scripts."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def norm_value(v):
    """Normalize a cell for order-insensitive multiset comparison —
    same contract as tools/check_oracle.py (floats by full-precision
    repr, so only BIT-identical doubles compare equal)."""
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
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
