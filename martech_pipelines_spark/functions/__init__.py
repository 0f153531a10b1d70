"""Scalar function library: the reference's row-level helpers as Column exprs.

Every function in the reference's ``utils/data_sanity_helpers.py`` and
``utils/date_time.py`` re-expressed as a native Spark ``Column`` expression
(JVM-side, codegen-friendly) — no Python UDFs anywhere in this package.
"""

from martech_pipelines_spark.functions.profile import (
    identity_coalesce,
    mobile_sanity,
    modify_reward,
    fix_dob,
    unix_epoch,
    get_birth_date,
    gender_implicit_columns,
    lenient_cast,
    try_cast_col,
    generic_date,
)
from martech_pipelines_spark.functions.datetime_fns import (
    ist_now,
    ist_today,
    ist_yesterday,
    ist_hour,
    ist_minute,
    format_string,
)

__all__ = [
    "identity_coalesce",
    "mobile_sanity",
    "modify_reward",
    "fix_dob",
    "unix_epoch",
    "get_birth_date",
    "gender_implicit_columns",
    "lenient_cast",
    "try_cast_col",
    "generic_date",
    "ist_now",
    "ist_today",
    "ist_yesterday",
    "ist_hour",
    "ist_minute",
    "format_string",
]
