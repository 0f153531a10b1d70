"""Round-5h corpus addition: end-to-end entity resolution.

``pipe8_entity_resolution`` — the full ER pipeline over a dirty customer
table with planted corrupted duplicates: attribute blocking → fuzzy name
match (Levenshtein) → connected components → survivorship (golden
record).  Full oracle including the recursive-CTE component stage (the
dd7/pipe4 pattern), so every stage — not just the pair scores — is
engine-checked.

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators.dedup import dup_clusters
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


# Deterministic dirt: every third customer gets a second record whose
# name has ONE character overwritten (position varies with the key), and
# whose strong attributes (nation, segment, acctbal) are unchanged —
# the classic "same entity, typo'd name" duplicate.
_CORRUPT_POS = "10 + (c_custkey % 8)"  # inside the digit run of the name

_DIRTY_SQL = f"""
        SELECT c_custkey * 2 AS rec_id, c_name, c_nationkey, c_acctbal,
               c_mktsegment
        FROM customer
        UNION ALL
        SELECT c_custkey * 2 + 1,
               substr(c_name, 1, {_CORRUPT_POS} - 1) || 'x'
                   || substr(c_name, {_CORRUPT_POS} + 1, 30),
               c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 = 0
"""

_PIPE8_ORACLE = f"""
    WITH RECURSIVE dirty AS ({_DIRTY_SQL}),
    pairs AS (
        SELECT a.rec_id AS id_a, b.rec_id AS id_b
        FROM dirty a
        JOIN dirty b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
         AND a.c_acctbal = b.c_acctbal
         AND a.rec_id < b.rec_id
        WHERE levenshtein(a.c_name, b.c_name) <= 2
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS id FROM edges),
    reach AS (
        SELECT id, id AS label FROM verts
        UNION
        SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id
    ),
    clus AS (
        SELECT id, CAST(min(label) AS BIGINT) AS cluster FROM reach GROUP BY id
    ),
    members AS (
        SELECT cl.cluster, d.rec_id, d.c_name
        FROM clus cl JOIN dirty d ON d.rec_id = cl.id
    )
    SELECT cluster,
           count(*) AS n_records,
           min(rec_id) AS golden_rec_id,
           min(CASE WHEN rec_id = cluster THEN c_name END) AS golden_name
    FROM members
    GROUP BY cluster
"""


@q("pipe8_entity_resolution", _PIPE8_ORACLE)
def pipe8_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end, every stage engine-checked:

    1. DIRTY TABLE — customers plus planted one-typo duplicates (strong
       attributes intact), the deterministic stand-in for a real dirty
       feed.
    2. BLOCKING — equi-join on (nation, segment, acctbal).  This is the
       scale lever: candidate pairs come from a KEYED shuffle on strong
       attributes, never an all-pairs name comparison; fan-out per block
       is data-bounded.
    3. SCORING — ``levenshtein(name_a, name_b) <= 2`` on the blocked
       candidates only (codegen expression, no UDF).
    4. CLUSTERING — ``dup_clusters`` min-label connected components
       (iterative distributed joins, localCheckpoint lineage control),
       value-checked here against the oracle's recursive CTE.
    5. SURVIVORSHIP — one golden record per cluster: lowest rec_id (the
       pristine original sorts below its corrupted twin by construction)
       and its name.

    Reference scope: §2.J north-star — identity stitching is the martech
    problem (the reference's E5/F1 identity coalesce is the 1-record
    form; this is the cross-record form)."""
    cust = load_table(spark, sf_dir, "customer")
    pos = F.lit(10) + (F.col("c_custkey") % 8)
    # substr(name, 1, pos-1) || 'x' || substr(name, pos+1, 30) — spelled
    # identically to the oracle's _DIRTY_SQL:
    corrupted = cust.where(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") * 2 + 1).alias("rec_id"),
        F.concat(
            F.col("c_name").substr(F.lit(1), pos - 1),
            F.lit("x"),
            F.col("c_name").substr(pos + 1, F.lit(30)),
        ).alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    originals = cust.select(
        (F.col("c_custkey") * 2).alias("rec_id"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    dirty = originals.unionByName(corrupted)

    a = dirty.select(
        F.col("rec_id").alias("id_a"),
        F.col("c_name").alias("name_a"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    b = dirty.select(
        F.col("rec_id").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk2"),
        F.col("c_acctbal").alias("ab2"),
        F.col("c_mktsegment").alias("ms2"),
    )
    pairs = (
        a.join(
            b,
            (a["c_nationkey"] == b["nk2"])
            & (a["c_mktsegment"] == b["ms2"])
            & (a["c_acctbal"] == b["ab2"])
            & (a["id_a"] < b["id_b"]),
        )
        .where(F.levenshtein("name_a", "name_b") <= 2)
        .select("id_a", "id_b")
    )
    clusters = dup_clusters(pairs)  # (id, cluster)
    members = clusters.join(
        dirty, clusters["id"] == dirty["rec_id"]
    ).select("cluster", "rec_id", "c_name")
    return members.groupBy("cluster").agg(
        F.count("*").alias("n_records"),
        F.min("rec_id").alias("golden_rec_id"),
        F.min(
            F.when(F.col("rec_id") == F.col("cluster"), F.col("c_name"))
        ).alias("golden_name"),
    )
