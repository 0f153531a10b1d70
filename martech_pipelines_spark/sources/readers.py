"""Sources (SURVEY.md §2.A): explicit-schema readers.

Covers the reference's scan surface re-expressed Spark-first:

- A1 catalog table scan        -> ``spark.table`` (thin wrapper kept for parity)
- A2/A3 incremental change scan-> parquet/Delta read + timestamp predicate
  (the CDC logic itself lives in operators.cdc; readers stay dumb)
- A4 text conf scan            -> ``spark.read.text`` + driver-side json parse
  (reference reads its JSON conf *through Spark* then collects —
  reference: martech_pipelines/tasks/base.py:75-80; we keep the API but the
  distributed read is pointless for a 1-KB file, so local paths short-circuit
  to ``json.load``)
- A5 CSV scan                  -> ``spark.read.csv`` with explicit schema
  (reference streams CSV through pandas chunks on the driver —
  reference: martech_pipelines/operators/clevertap_user_profile.py:91; the
  engine reads distributed and moves batching to the sink)
- A6 range generator           -> ``spark.range``
- A7 object-store listing      -> Hadoop glob paths on any ``spark.read``
- A8 parquet load              -> ``load_table`` below

At 100 TB the parquet reader is the whole ballgame: explicit schemas keep
``ReadSchema`` minimal (column pruning), and filters passed by callers reach
``PushedFilters`` because nothing here materializes or caches eagerly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyspark.sql import functions as F

from martech_pipelines_spark.sources.schemas import SCHEMAS, TABLES

# Columns that MAY be stored as parquet TIMESTAMP(NANOS) (pandas-written).
# Spark has no nanosecond timestamp type; with
# ``spark.sql.legacy.parquet.nanosAsLong=true`` they arrive as raw
# nanosecond longs and are converted to microsecond timestamps here
# (integer ``div`` — double math would lose precision above 2^53 ns).
# Whether a column is actually nanos is sniffed from the parquet footer
# per path (writers vary by pandas/arrow version); footer probes cache.
_MAYBE_NANOS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

_NANOS_CACHE: dict[tuple, bool] = {}


def _is_nanos(path: str, col: str) -> bool:
    """True iff ``col`` in the parquet at ``path`` is TIMESTAMP(NANOS).

    Driver-side footer read (a few KB) — never touches row data. Handles
    both a single file and a directory of part files (first part decides;
    mixed-unit directories are not a case any sane writer produces).

    The probe result is cached per (probe file, col, mtime, size) — NOT
    per path alone — so a long-lived session notices when the file is
    regenerated in place with a different timestamp unit (exactly the
    between-rounds regeneration this sniffing exists for) instead of
    serving a stale unit decision.
    """
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith("_")
        )
        if not parts:
            return False
        probe = os.path.join(path, parts[0])
    try:
        st = os.stat(probe)
        key = (probe, col, st.st_mtime_ns, st.st_size)
    except OSError:
        return False
    if key in _NANOS_CACHE:
        return _NANOS_CACHE[key]
    try:
        pf = pq.ParquetFile(probe)
        typ = pf.schema_arrow.field(col).type
        result = getattr(typ, "unit", None) == "ns"
        if result:
            # Spark's own legacy INT96 timestamps ALSO surface as
            # timestamp[ns] through arrow, but Spark reads INT96
            # natively — forcing the nanos-as-long path on them fails
            # with PARQUET_COLUMN_DATA_TYPE_MISMATCH. Only true
            # INT64/TIMESTAMP(NANOS) columns take the long route.
            idx = pf.schema_arrow.get_field_index(col)
            if pf.schema.column(idx).physical_type == "INT96":
                result = False
    except (OSError, KeyError):
        result = False
    _NANOS_CACHE[key] = result
    return result


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """A8: read one synthetic table with its registered schema.

    The explicit schema (not mergeSchema/infer) means the scan plans with a
    pruned ``ReadSchema`` as soon as the caller selects columns.
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    nanos = tuple(
        c for c in _MAYBE_NANOS_COLS.get(table, ()) if _is_nanos(path, c)
    )
    if not nanos:
        return spark.read.schema(SCHEMAS[table]).parquet(path)
    physical = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nanos else f.dataType)
            for f in SCHEMAS[table].fields
        ]
    )
    df = spark.read.schema(physical).parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every registered table from a scale-factor directory."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` sees the same
    names the DuckDB oracle does (A1 analog of ``USE db`` +
    ``spark.read.table`` — reference: martech_pipelines/tasks/user_profile/clevertap.py:8,11)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """A5: distributed CSV scan with explicit schema.

    Replaces the reference's driver-side ``pd.read_csv(chunksize=...)``
    loop; a 100-TB CSV prefix splits across executors for free, and
    empty-string/NaN cells arrive as proper nulls (C9 normalization is a
    non-op in Spark)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_text_conf(spark: SparkSession, conf_file: str) -> dict:
    """A4: job-config read (reference: martech_pipelines/tasks/base.py:75-80).

    The reference does ``spark.read.format('text')`` + ``toPandas()`` +
    ``json.loads`` so that DBFS paths work. Local files short-circuit to
    plain ``json.load``; non-local URIs keep the Spark text-reader path.
    """
    if os.path.exists(conf_file):
        with open(conf_file) as fh:
            return json.load(fh)
    if "://" not in conf_file:
        raise FileNotFoundError(f"conf file not found: {conf_file}")
    lines = spark.read.format("text").load(conf_file).collect()
    return json.loads("".join(r[0] for r in lines))


def range_source(spark: SparkSession, start: int, end: int, step: int = 1) -> DataFrame:
    """A6: synthetic integer range (reference: martech_pipelines/tasks/sample/entrypoint.py:14)."""
    return spark.range(start, end, step)


def read_evolving_parquet(
    spark: SparkSession,
    path: str,
    expected: T.StructType | None = None,
) -> DataFrame:
    """A1 variant for SCHEMA-EVOLVED parquet directories: a log written
    over months gains/loses columns as producers deploy. Plain
    ``spark.read.parquet`` takes the schema from a sample file and
    silently drops later columns; ``mergeSchema=true`` unions all file
    footers (absent columns arrive NULL — the same semantics as DuckDB's
    ``union_by_name=true``).

    With ``expected``, the merged frame is conformed to exactly that
    schema: missing columns materialize as typed NULLs and extra columns
    drop — so downstream operators always see one stable shape no
    matter which files exist (the contract `load_table` gives the fixed
    testdata, extended to evolving logs).

    Scale note: footer merging is a driver-side metadata pass over file
    footers, not a data read; per-file column pruning still applies (a
    file without column c contributes constant nulls, not IO).
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected is None:
        return df
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in expected.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan with an explicit schema and PERMISSIVE corrupt-row
    capture (the wire format of the reference's REST integrations —
    martech_pipelines/hooks/http.py request/response bodies — landed as
    an ingestible log).

    The declared ``schema`` is extended with a corrupt-record column:
    malformed lines arrive as rows whose data fields are NULL and whose
    ``corrupt_col`` holds the raw line, so a pipeline can split
    good/quarantine streams in one pass instead of failing the scan
    (FAILFAST) or silently dropping rows (DROPMALFORMED).  Explicit
    schema also means NO inference pre-pass — at 100 TB a schema-less
    ``spark.read.json`` scans the data twice.

    Caveat: Spark refuses queries whose pruned projection is ONLY the
    corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    — cache the parsed frame before quarantine-only counts."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC scan — the other columnar format Spark ships natively (no
    extra package, unlike Avro's external spark-avro artifact).  ORC
    supports the same scan-time machinery as parquet: column pruning,
    predicate pushdown into stripe/row-group indexes, and vectorized
    reading, so at 100 TB an ORC lake is first-class.  Pass ``schema``
    to skip footer-merging schema resolution on very wide directories;
    omit it to take the footer schema (ORC footers carry exact types —
    no inference pass, unlike JSON/CSV)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
