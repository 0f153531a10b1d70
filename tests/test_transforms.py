"""Transform-pipeline semantics (SURVEY.md §2.C6-C9, §2.I, FIXTURES.md §1)."""

from __future__ import annotations

import datetime as dt

from martech_pipelines_spark.operators.transforms import (
    ProfileExportConfig,
    TRANSFORMATIONS,
    apply_type_map,
    invalid_count,
    profile_export_pipeline,
    rename_columns,
    select_attributes,
)
from martech_pipelines_spark.sources.schemas import USER_PROPERTIES_SCHEMA


def _profiles(spark):
    rows = [
        (1, "919876543210", "1988-07-01", 12.345, "F",
         '{"last7days": {"men": 3, "women": 0, "kids": 1, "home": 2}}',
         "insert", dt.datetime(2024, 1, 1)),
        (0, "12345", "1899-05-02", None, "M", None,  # falsy id -> invalid
         "insert", dt.datetime(2024, 1, 1)),
        (2, "abc", "garbage", 0.999, None, '{"other": 1}',
         "update_postimage", dt.datetime(2024, 1, 2)),
    ]
    return spark.createDataFrame(rows, USER_PROPERTIES_SCHEMA)


def test_select_attributes_drops_missing_silently(spark):
    df = _profiles(spark)
    out = select_attributes(df, ["mobile", "nope", "gender"])
    assert out.columns == ["mobile", "gender"]


def test_rename_overwrites_existing_target(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id long, x string, y string")
    out = rename_columns(df, {"x": "y"})
    assert out.columns == ["id", "y"]
    assert out.collect()[0]["y"] == "a"  # source value wins, old target dropped


def test_apply_type_map_routes_dob_to_fix_dob(spark):
    df = _profiles(spark)
    out = apply_type_map(
        df, {"mobile": "mobile_sanity", "dob": "date", "reward_points": "modify_reward"}
    )
    rows = {r["customer_id"]: r for r in out.collect()}
    assert rows[1]["mobile"] == "9876543210"
    assert rows[1]["dob"] == "1988-07-01"
    assert rows[1]["reward_points"] == 1234
    assert rows[0]["dob"] == "1952-05-02"  # year<1900 -> 1952
    assert rows[2]["mobile"] is None and rows[2]["dob"] is None


def test_apply_type_map_unknown_target_raises(spark):
    df = _profiles(spark)
    try:
        apply_type_map(df, {"mobile": "nonsense"})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nonsense" in str(e)


def test_full_export_pipeline(spark):
    cfg = ProfileExportConfig(
        identity_fields=["customer_id"],
        transformation_fn="get_gender_implicit_data",
        transformation_params={"data_col": "v1__json", "signal_field": "last7days"},
        data_type_map={"mobile": "mobile_sanity", "dob": "date",
                       "reward_points": "modify_reward"},
        attributes=["mobile", "dob", "gender", "reward_points", "gender_men_dp"],
        swap_key_map={"mobile": "phone", "gender": "Gender"},
    )
    df = _profiles(spark)
    out = profile_export_pipeline(df, cfg)
    assert sorted(out.columns) == sorted(
        ["identity", "phone", "dob", "Gender", "reward_points", "gender_men_dp"]
    )
    rows = {r["identity"]: r for r in out.collect()}
    assert set(rows) == {"1", "2"}  # customer_id 0 is falsy -> rejected
    assert rows["1"]["phone"] == "9876543210"
    assert rows["1"]["gender_men_dp"] == 3
    assert rows["2"]["gender_men_dp"] == 0
    assert invalid_count(df, ["customer_id"]) == 1


def test_registry_is_extensible(spark):
    assert "get_gender_implicit_data" in TRANSFORMATIONS
    assert "get_birth_date" in TRANSFORMATIONS


def test_constraint_check_detects_violations(spark):
    from martech_pipelines_spark.operators.transforms import constraint_check

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "zz", 50.0), (3, "b", None)],
        "id long, cat string, v double",
    )
    out = {
        r["check_name"]: (r["n_violations"], r["ok"])
        for r in constraint_check(
            df,
            not_null=["cat"],
            unique=["id"],
            accepted_values={"cat": ["a", "b"]},
            ranges={"v": (0, 10)},
        ).collect()
    }
    assert out["not_null(cat)"] == (1, False)
    assert out["unique(id)"] == (1, False)          # id=2 twice
    assert out["accepted_values(cat)"] == (2, False)  # 'zz' + null
    assert out["range(v)"] == (3, False)            # -1.0, 50.0, null


def test_constraint_check_dbt_null_mode_and_quote_rejection(spark):
    import pytest as _pytest

    from martech_pipelines_spark.operators.transforms import constraint_check

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "zz")], "id long, cat string"
    )
    # dbt-compatible mode: NULL is NOT an accepted_values violation
    out = {
        r["check_name"]: r["n_violations"]
        for r in constraint_check(
            df,
            accepted_values={"cat": ["a", "b"]},
            null_violates_accepted_values=False,
        ).collect()
    }
    assert out["accepted_values(cat)"] == 1  # only 'zz'
    # a column name carrying a quote cannot be embedded in the stack()
    # expression — rejected up front, not malformed SQL downstream
    bad = df.withColumnRenamed("cat", "ca't")
    with _pytest.raises(ValueError, match="quote"):
        constraint_check(bad, not_null=["ca't"])
