"""Explicit StructType schemas for every table the engine reads.

The reference relies on metastore schemas and pandas inference (reference:
martech_pipelines/operators/clevertap_user_profile.py:91 infers CSV schemas
via ``pd.read_csv``). The engine never infers in production paths: every
read gets an explicit schema so that column pruning and filter pushdown are
stable and a schema drift fails loudly at analysis time, not at runtime on
a 1000-executor cluster.

Two schema families:
1. The driver synthetic testdata tables (TESTDATA.md / FIXTURES.md §2) —
   a TPC-H-ish star schema plus `events` (the CDC log stand-in),
   `documents` (text corpus), `embeddings` (similarity corpus).
2. Reference-domain control tables (FIXTURES.md §1) used by the CDC /
   transform pipeline unit tests: `user_properties` (models the Delta-CDF
   stream of ``nykaa_user_properties``), `streaming_job_runs` (watermark),
   `user_property_mapping` (attribute routing).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver synthetic tables -------------------------------------------------

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES: tuple[str, ...] = tuple(SCHEMAS)

# --- reference-domain control tables (unit-test fixtures) --------------------

# Models the Delta-CDF change stream of ``nykaa_user_properties`` consumed at
# reference: martech_pipelines/tasks/user_profile/clevertap.py:19-53.
USER_PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("mobile", T.StringType()),
        T.StructField("dob", T.StringType()),
        T.StructField("reward_points", T.DoubleType()),
        T.StructField("gender", T.StringType()),
        T.StructField("v1__json", T.StringType()),
        T.StructField("_change_type", T.StringType()),
        T.StructField("_commit_timestamp", T.TimestampType()),
    ]
)

# Watermark table (reference: martech_pipelines/tasks/user_profile/clevertap.py:10-14).
STREAMING_JOB_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("query_name", T.StringType()),
        T.StructField("last_job_run", T.TimestampType()),
    ]
)

# Attribute routing table (reference: martech_pipelines/tasks/user_profile/clevertap.py:56-58).
USER_PROPERTY_MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("property_name", T.StringType()),
        T.StructField("clevertap", T.BooleanType()),
        T.StructField("netcore", T.BooleanType()),
    ]
)

# JSON signal blob parsed by get_gender_implicit_data
# (reference: martech_pipelines/utils/data_sanity_helpers.py:165-177).
# The reference reads the *configured* signal field from the JSON (default
# last7days), so the parse schema is keyed on that field name.
def gender_signal_schema(signal_field: str = "last7days") -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                signal_field,
                T.StructType(
                    [
                        T.StructField("men", T.LongType()),
                        T.StructField("women", T.LongType()),
                        T.StructField("kids", T.LongType()),
                        T.StructField("home", T.LongType()),
                    ]
                ),
            )
        ]
    )


GENDER_SIGNAL_SCHEMA = gender_signal_schema()


def schema_for(table: str) -> T.StructType:
    """Schema registry lookup; KeyError on unknown table is intentional."""
    return SCHEMAS[table]
