"""Round-5q corpus addition: ORC source round-trip.

``a10_orc_roundtrip`` — the remaining built-in columnar format: the
customer table written to ORC (zlib, Spark's native writer) and read
back through ``sources.read_orc``; the read-back rows are oracle-checked
value-identical against the parquet source of truth, proving the format
path end to end (type mapping, predicate-capable scan).  Parquet, CSV,
JSON-lines, text-conf and binaryFile already have corpus entries
(a1/a5/a9/a4/mm1); ORC closes the set of formats Spark ships without
extra packages (Avro needs the external spark-avro artifact — import-
gated, out of scope for this container).

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table
from martech_pipelines_spark.sources.readers import read_orc


def write_customer_orc(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the deterministic ORC copy of customer.  Path keyed
    by full dataset path + pid (same hygiene as a9's jsonl log: no
    cross-sf aliasing, no concurrent-session overwrite races)."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out_dir = os.path.join("/tmp", f"mp_spark_orc_{tag}_{os.getpid()}")
    load_table(spark, sf_dir, "customer").coalesce(4).write.mode(
        "overwrite"
    ).orc(out_dir)
    return out_dir


@q("a10_orc_roundtrip", "SELECT * FROM customer")
def a10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the ORC source: customer written with Spark's
    native ORC writer, read back via ``read_orc``, compared against the
    parquet source of truth — longs, strings and doubles must all map
    through ORC's type system unchanged.  Filter pushdown into the ORC
    scan is plan-asserted in pytest (ORC supports predicate pushdown
    like parquet; a format path that silently full-scans would be a
    100-TB regression)."""
    path = write_customer_orc(spark, sf_dir)
    return read_orc(spark, path)


# =============================================================================
# t37: lexicon-join sentiment scoring (SURVEY §7.3's sentiment-lexicon
# join bullet; the last unticked item of the extended text surface).
# =============================================================================

_T37_LEXICON = {"fast": 1, "big": 1, "fresh": 1, "slow": -1, "small": -1, "stale": -1}


def _t37_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_extended import _DUCK_TOKENS

    case = " ".join(
        f"WHEN '{w}' THEN {v}" for w, v in _T37_LEXICON.items()
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_DUCK_TOKENS.format(col='text')}) AS token
        FROM documents
    )
    SELECT doc_id,
           CAST(sum(CASE token {case} ELSE 0 END) AS BIGINT) AS sent_mass,
           count(*) AS n_tokens,
           round(CAST(sum(CASE token {case} ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS sent_score,
           CASE WHEN sum(CASE token {case} ELSE 0 END) > 0 THEN 'pos'
                WHEN sum(CASE token {case} ELSE 0 END) < 0 THEN 'neg'
                ELSE 'neu' END AS sent_label
    FROM toks GROUP BY doc_id
    """


@q("t37_sentiment", _t37_oracle())
def t37_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sentiment over the synthetic corpus vocabulary via the
    broadcast lexicon join (see ``text.sentiment_scores`` — the form
    that survives a 100k-entry lexicon; the oracle folds the same
    lexicon as a CASE).  LEFT join semantics keep zero-hit docs."""
    from martech_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    return TX.sentiment_scores(docs, _T37_LEXICON)
