"""Date/time utilities (SURVEY.md §2.G), IST-anchored like the reference.

Reference: martech_pipelines/utils/date_time.py — every helper formats
"now" in Asia/Kolkata. The engine keeps the session timezone neutral (UTC,
see session.py) and anchors IST *explicitly* per expression, so these work
identically on any cluster regardless of session tz.

Column variants (for use inside queries) and driver-side string variants
(for config interpolation, G4) are both provided.
"""

from __future__ import annotations

import datetime as dt
import zoneinfo

from pyspark.sql import Column
from pyspark.sql import functions as F

IST = "Asia/Kolkata"
_IST_TZ = zoneinfo.ZoneInfo(IST)


def ist_now() -> Column:
    """G3: current timestamp shifted to IST wall time (naive)."""
    return F.from_utc_timestamp(F.current_timestamp(), IST)


def ist_today() -> Column:
    """G2: today's date string in IST, ``yyyy-MM-dd``."""
    return F.date_format(ist_now(), "yyyy-MM-dd")


def ist_yesterday() -> Column:
    """G1: yesterday's date string in IST, ``yyyy-MM-dd``."""
    return F.date_format(F.date_sub(F.to_date(ist_now()), 1), "yyyy-MM-dd")


def ist_hour() -> Column:
    """G2: current IST hour, zero-padded ``HH``."""
    return F.date_format(ist_now(), "HH")


def ist_minute() -> Column:
    """G2: current IST minute, zero-padded ``mm``."""
    return F.date_format(ist_now(), "mm")


# --- driver-side (config interpolation, G4) ----------------------------------


def _now_ist() -> dt.datetime:
    return dt.datetime.now(_IST_TZ)


def format_string(data):
    """G4: interpolate ``{yesterday}/{today}/{hour}/{min}`` placeholders in
    config strings (S3 key patterns etc.); non-strings pass through.

    Reference: martech_pipelines/utils/date_time.py:31-40. Driver-side by
    design — this shapes *paths and config*, not data.
    """
    if not isinstance(data, str):
        return data
    now = _now_ist()
    return data.format(
        yesterday=(now - dt.timedelta(days=1)).strftime("%Y-%m-%d"),
        today=now.strftime("%Y-%m-%d"),
        hour=now.strftime("%H"),
        min=now.strftime("%M"),
    )
