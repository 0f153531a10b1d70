"""Unit tests pinning the scalar-function semantics (SURVEY.md §2.F/G).

These tests ARE the spec: the reference leaves these functions untested
(SURVEY.md §5) and several reference behaviors are bugs we deliberately do
not reproduce (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.functions import (
    fix_dob,
    format_string,
    get_birth_date,
    gender_implicit_columns,
    identity_coalesce,
    lenient_cast,
    mobile_sanity,
    modify_reward,
    try_cast_col,
    unix_epoch,
)


def one_col(spark, values, dtype="string"):
    return spark.createDataFrame([(v,) for v in values], f"v {dtype}")


def collected(df, col):
    return [r[0] for r in df.select(col).collect()]


# --- F5 mobile_sanity --------------------------------------------------------


def test_mobile_sanity_string_inputs(spark):
    vals = [
        "919876543210",  # 12 digits -> last 10
        "9876543210",  # exactly 10 -> kept
        "12345",  # <10 -> null
        "abc",  # non-numeric -> null
        "9876543210.0",  # float-ish string: not in int() domain -> null
        "0012345678901",  # leading zeros dropped by int(): 11 digits left
        None,
    ]
    df = one_col(spark, vals)
    out = collected(df.select(mobile_sanity(F.col("v")).alias("m")), "m")
    assert out == [
        "9876543210",
        "9876543210",
        None,
        None,
        None,
        "2345678901",
        None,
    ]


def test_mobile_sanity_numeric_input(spark):
    # pandas float-typed column: str(int(9876543210.0)) -> "9876543210"
    df = one_col(spark, [9876543210.0, 12345.0, None], "double")
    out = collected(df.select(mobile_sanity(F.col("v"), numeric=True).alias("m")), "m")
    assert out == ["9876543210", None, None]


# --- F6 modify_reward --------------------------------------------------------


def test_modify_reward_truncates_toward_zero(spark):
    df = one_col(spark, [12.345, 0.999, -1.019, None], "double")
    out = collected(df.select(modify_reward(F.col("v")).alias("p")), "p")
    # int(12.345*100) == 1234 (double 1234.4999...), int(0.999*100) == 99,
    # int(-1.019*100) == -101 (toward zero, not floor -102)
    assert out == [1234, 99, -101, None]


# --- F7/F9 fix_dob / get_birth_date -----------------------------------------


def test_fix_dob_formats_and_1952_rule(spark):
    vals = [
        "1988-07-01",
        "1988-07-01 10:20:30",
        "2001-02-03 04:05:06.789",
        "1899-05-02",  # year<1900 -> 1952
        "0044-01-01 BC",  # strip " BC", year 44 -> 1952
        "garbage",
        "",
        None,
    ]
    df = one_col(spark, vals)
    out = collected(df.select(fix_dob(F.col("v")).alias("d")), "d")
    assert out == [
        "1988-07-01",
        "1988-07-01",
        "2001-02-03",
        "1952-05-02",
        "1952-01-01",
        None,
        None,
        None,
    ]


def test_get_birth_date(spark):
    df = one_col(spark, ["1988-07-01", "1899-12-25", None])
    out = collected(df.select(get_birth_date(F.col("v")).alias("b")), "b")
    assert out == ["Jul-01", "Dec-25", None]


# --- F8 unix_epoch -----------------------------------------------------------


def test_unix_epoch_ist_midnight(spark):
    # 1988-07-01 00:00 IST = 1988-06-30 18:30 UTC = 583698600
    df = one_col(spark, ["1988-07-01", "1970-01-02", "nope", None])
    out = collected(df.select(unix_epoch(F.col("v")).alias("e")), "e")
    assert out == ["$D_583698600", f"$D_{86400 - 19800}", None, None]


# --- F10 gender implicit -----------------------------------------------------


def test_gender_implicit_defaults(spark):
    vals = [
        '{"last7days": {"men": 3, "women": 0, "kids": 1, "home": 2}}',
        '{"last7days": {"men": 5}}',
        '{"other": 1}',
        "not json",
        None,
    ]
    df = one_col(spark, vals)
    cols = gender_implicit_columns(F.col("v"))
    rows = df.select(*[c.alias(n) for n, c in cols.items()]).collect()
    assert [tuple(r) for r in rows] == [
        (3, 0, 1, 2),
        (5, 0, 0, 0),
        (0, 0, 0, 0),
        (0, 0, 0, 0),  # graceful default where the reference would crash
        (0, 0, 0, 0),
    ]


def test_gender_implicit_configured_signal_field(spark):
    """signal_field is honored, not silently ignored (ADVICE r01): the
    reference reads the *configured* field from the JSON blob."""
    vals = [
        '{"last30days": {"men": 7, "women": 4}, "last7days": {"men": 1}}',
        '{"last7days": {"men": 9}}',  # wrong field -> defaults
    ]
    df = one_col(spark, vals)
    cols = gender_implicit_columns(F.col("v"), signal_field="last30days")
    rows = df.select(*[c.alias(n) for n, c in cols.items()]).collect()
    assert [tuple(r) for r in rows] == [(7, 4, 0, 0), (0, 0, 0, 0)]


# --- F1 identity coalesce ----------------------------------------------------


def test_identity_coalesce_falsy_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com"),
            (0, "b@x.com"),  # numeric 0 is falsy -> fall through to email
            (2, ""),  # empty string falsy but id wins
            (0, ""),  # all falsy -> null
            (None, "c@x.com"),
        ],
        "cid long, email string",
    )
    out = collected(
        df.select(identity_coalesce(df, ["cid", "email"]).alias("i")), "i"
    )
    assert out == ["1", "b@x.com", "2", None, "c@x.com"]


def test_identity_coalesce_missing_columns_skipped(spark):
    df = spark.createDataFrame([(7,)], "cid long")
    out = collected(
        df.select(identity_coalesce(df, ["nope", "cid"]).alias("i")), "i"
    )
    assert out == ["7"]


# --- F4 lenient casts --------------------------------------------------------


def test_lenient_cast_keeps_original_on_failure(spark):
    df = one_col(spark, ["42", "abc", None, "7.9"])
    out = collected(df.select(lenient_cast(F.col("v"), "long").alias("c")), "c")
    assert out == ["42", "abc", None, "7.9"]
    strict = collected(df.select(try_cast_col(F.col("v"), "long").alias("c")), "c")
    assert strict == [42, None, None, None]


def test_lenient_cast_float(spark):
    df = one_col(spark, ["1.5", "x", None])
    out = collected(df.select(lenient_cast(F.col("v"), "double").alias("c")), "c")
    assert out == ["1.5", "x", None]


# --- G4 format_string (driver-side) -----------------------------------------


def test_format_string_placeholders():
    s = format_string("s3://b/{today}/{yesterday}/{hour}/{min}/x.csv")
    assert "{" not in s and s.startswith("s3://b/") and s.endswith("/x.csv")
    assert format_string(123) == 123
