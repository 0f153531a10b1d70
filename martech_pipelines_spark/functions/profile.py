"""Profile-sanitization functions (SURVEY.md §2.F) as Column expressions.

The reference implements these as per-record Python dict transforms executed
on the driver (reference: martech_pipelines/utils/data_sanity_helpers.py).
Here each becomes a pure ``Column`` expression: JVM-evaluated, whole-stage
codegen'd, and therefore 100-TB-capable. Pinned edge semantics (several of
which the reference leaves untested or buggy — SURVEY.md §0) are documented
per function and locked by tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from martech_pipelines_spark.sources.schemas import gender_signal_schema

IST = "Asia/Kolkata"

# Python ``int(str)`` accepts only optional sign + digits (after strip);
# this guard reproduces that domain for string-typed mobile columns.
_INT_STRING = r"^[+-]?[0-9]+$"


def _truthy(col: Column, dtype: T.DataType) -> Column:
    """Python-falsy check per type: None, "", 0, 0.0 are all 'missing'.

    Mirrors ``data.get(field)`` truthiness in identity_field_check
    (reference: martech_pipelines/utils/data_sanity_helpers.py:18,25) —
    note ``"0"`` as a *string* is truthy in Python, so only numeric zero
    is treated as missing.
    """
    cond = col.isNotNull()
    if isinstance(dtype, T.StringType):
        cond = cond & (col != F.lit(""))
    elif isinstance(dtype, T.NumericType):
        cond = cond & (col != F.lit(0))
    elif isinstance(dtype, T.BooleanType):
        cond = cond & col
    return cond


def identity_coalesce(df: DataFrame, fields: str | list[str]) -> Column:
    """F1: first *truthy* value among candidate identity columns, else null.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:10-28. Plain
    ``coalesce`` is not enough — the reference treats falsy values (0, "")
    as missing, not just null, so each candidate is gated by a truthiness
    predicate derived from its actual column type.
    """
    if isinstance(fields, str):
        fields = [fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    branches = []
    for name in fields:
        if name not in by_name:
            continue
        c = F.col(name)
        branches.append(F.when(_truthy(c, by_name[name]), c.cast("string")))
    if not branches:
        return F.lit(None).cast("string")
    return F.coalesce(*branches)


def mobile_sanity(col: Column, numeric: bool = False) -> Column:
    """F5: normalize a mobile number to its last 10 digits, else null.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:96-110 —
    ``str(int(mobile))[-10:]`` guarded to exactly-10-length. Pinned:
    - string input must be a pure integer string (Python ``int(str)``
      domain); "98765.0" or "abc" -> null,
    - numeric (double) input truncates the fractional part first
      (``numeric=True`` path; pandas float-typed CSV columns),
    - leading zeros are *dropped* before the last-10 slice (int round-trip),
    - <10 digits after normalization -> null.
    """
    if numeric:
        as_int_str = F.when(col.isNotNull(), col.cast("long").cast("string"))
    else:
        trimmed = F.trim(col)
        as_int_str = F.when(
            trimmed.rlike(_INT_STRING), trimmed.cast("decimal(38,0)").cast("string")
        )
    last10 = F.substring(as_int_str, -10, 10)
    return F.when(F.length(last10) == 10, last10)


def modify_reward(col: Column) -> Column:
    """F6: rupees -> integer paise, ``int(reward * 100)``.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:113-121.
    Python ``int()`` truncates toward zero; Spark's double->long cast does
    too, so a plain cast (NOT round) is the faithful mapping. Null in ->
    null out (the reference returns None on the TypeError).
    """
    return (col * F.lit(100)).cast("long")


# fix_dob format list, in trial order
# (reference: martech_pipelines/utils/data_sanity_helpers.py:129).
_DOB_FORMATS = ["yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss.SSSSSS"]


def _dob_timestamp(col: Column) -> Column:
    """Parse a dob string per fix_dob's trial-order format list.

    ``try_to_timestamp`` yields null on mismatch, so ``coalesce`` reproduces
    first-format-wins. The " BC" suffix strip (3 chars) precedes parsing
    (reference: martech_pipelines/utils/data_sanity_helpers.py:127-128).
    """
    val = F.when(col.isNotNull() & (col != ""), col)
    val = F.when(
        val.endswith("BC"), F.substring(val, F.lit(1), F.length(val) - 3)
    ).otherwise(val)
    return F.coalesce(*[F.try_to_timestamp(val, F.lit(fmt)) for fmt in _DOB_FORMATS])


def fix_dob(col: Column) -> Column:
    """F7: sanitize a date-of-birth string to ``yyyy-MM-dd``.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:124-141.
    Pinned semantics: strip " BC" suffix; try the three formats in order;
    any parsed year < 1900 has its year replaced with **1952** (the
    reference's quirk, kept verbatim); unparseable/empty/null -> null.
    """
    ts = _dob_timestamp(col)
    d = F.to_date(ts)
    fixed = F.when(F.year(d) < 1900, F.make_date(F.lit(1952), F.month(d), F.dayofmonth(d))).otherwise(d)
    return F.date_format(fixed, "yyyy-MM-dd")


def unix_epoch(col: Column) -> Column:
    """F8: ``yyyy-MM-dd`` string -> CleverTap epoch-date string ``$D_<sec>``.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:144-153 uses
    naive ``datetime.timestamp()`` — epoch of *local* midnight, and the
    reference runs IST-anchored (utils/date_time.py:4). Pinned: epoch
    seconds of IST midnight regardless of Spark session timezone, via an
    explicit Asia/Kolkata conversion. Parse failure -> null (the
    reference's except-path is itself buggy; intent is None).
    """
    d = F.try_to_timestamp(col, F.lit("yyyy-MM-dd"))
    ist_instant = F.to_utc_timestamp(d, IST)
    return F.concat(F.lit("$D_"), F.unix_timestamp(ist_instant).cast("string"))


def get_birth_date(col: Column) -> Column:
    """F9: dob -> ``MMM-dd`` (e.g. ``Aug-13``) after fix_dob sanitation.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:156-162.
    """
    ts = _dob_timestamp(col)
    d = F.to_date(ts)
    fixed = F.when(F.year(d) < 1900, F.make_date(F.lit(1952), F.month(d), F.dayofmonth(d))).otherwise(d)
    return F.date_format(fixed, "MMM-dd")


def gender_implicit_columns(col: Column, signal_field: str = "last7days") -> dict[str, Column]:
    """F10: parse the JSON signal blob into four int columns, 0 defaults.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:165-177.
    ``from_json`` yields null on malformed JSON; every missing level
    collapses to the 0 default (the reference would *crash* on bad JSON —
    we pin the graceful-default intent).
    """
    parsed = F.from_json(col, gender_signal_schema(signal_field))
    sig = parsed[signal_field]
    out = {}
    for k in ("men", "women", "kids", "home"):
        out[f"gender_{k}_dp"] = F.coalesce(sig[k].cast("int"), F.lit(0))
    return out


def try_cast_col(col: Column, target: str) -> Column:
    """Strict-null lenient cast: typed value where parseable, null otherwise.

    One of the two pinned resolutions of the reference's keep-original-on-
    failure semantics (SURVEY.md §7.4.3) — use where the downstream column
    must be typed.
    """
    return col.try_cast(target)


def lenient_cast(col: Column, target: str) -> Column:
    """Keep-original lenient cast, faithful to the reference.

    Reference: martech_pipelines/utils/data_sanity_helpers.py:62-70 keeps
    the *original* value when int/float parsing fails (mixed-type column in
    Python). Spark columns are monotyped, so the faithful mapping is a
    string column: the cast value's canonical string where the cast
    succeeds, the original string otherwise. Null passes through.
    """
    casted = col.try_cast(target)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(casted.cast("string"), col.cast("string"))
    )


def generic_date(col: Column) -> Column:
    """F4 'date' branch for non-dob fields: parse and emit ``yyyy-MM-dd``.

    The reference uses ``dateutil.parser.parse`` (very lenient); we pin the
    formats that actually occur (ISO date / timestamp) + keep-original on
    failure, matching the lenient-cast contract.
    """
    parsed = F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
    )
    return F.coalesce(F.date_format(parsed, "yyyy-MM-dd"), col.cast("string"))
