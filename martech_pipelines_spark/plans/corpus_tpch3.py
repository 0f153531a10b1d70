"""TPC-H completion: q2/q9/q11/q16/q20 over a SYNTHESIZED partsupp.

The driver's star schema ships no ``partsupp`` (COVERAGE.md §J documents
the 5 classic queries blocked on it). This module closes the gap with a
deterministic arithmetic synthesis both engines compute identically —
4 suppliers per part via modulo mapping onto the contiguous supplier
keys, integer-derived availqty and a 2-dp supplycost:

    ps_suppkey    = (p_partkey*7  + i*13)  % n_supp          (i in 0..3)
    ps_availqty   = (p_partkey*37 + i*11)  % 9999 + 1
    ps_supplycost = ((p_partkey*13 + i*101) % 100000) / 100.0

Pure integer arithmetic + one exact division: bit-identical rows in
Spark and DuckDB, so all five queries get FULL value oracles. Query
predicates are adapted to the synthetic dimension vocabulary (p_type
equality instead of LIKE '%BRASS', a modulo stand-in for the q16
complaints filter, 2*availqty > qty instead of availqty > 0.5*qty so the
comparison stays in exact arithmetic) — each divergence documented on
the query.

Determinism rules as corpus.py: DECIMAL money math, rounded doubles at
the boundary, no LIMIT without a total order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import q
from martech_pipelines_spark.sources import load_table

_PS_SQL = """
    partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey * 7 + u.i * 13) % (SELECT count(*) FROM supplier)
                   AS ps_suppkey,
               (p_partkey * 37 + u.i * 11) % 9999 + 1 AS ps_availqty,
               ((p_partkey * 13 + u.i * 101) % 100000) / 100.0
                   AS ps_supplycost
        FROM part, unnest(range(0, 4)) u(i)
    )
"""


def _partsupp(spark, sf_dir):
    """The Spark twin of the oracle's partsupp CTE (docstring above).

    ``n_supp`` is a 1-value control scalar (legitimate driver-side
    count); everything else is codegen arithmetic on the part scan — at
    any scale this synthesizes partsupp for free, no shuffle."""
    n_supp = load_table(spark, sf_dir, "supplier").count()
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    return part.select(
        "p_partkey", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") * 7 + F.col("i") * 13) % n_supp)
        .cast("long")
        .alias("ps_suppkey"),
        ((F.col("p_partkey") * 37 + F.col("i") * 11) % 9999 + 1)
        .cast("long")
        .alias("ps_availqty"),
        (((F.col("p_partkey") * 13 + F.col("i") * 101) % 100000) / 100.0).alias(
            "ps_supplycost"
        ),
    )


def _dec(c):
    return F.col(c).cast("decimal(18,2)")


# =============================================================================
# q2: minimum-cost supplier
# =============================================================================


@q(
    "q2_min_cost_supplier",
    f"""
    WITH {_PS_SQL},
    target AS (
        SELECT p_partkey FROM part WHERE p_size <= 15 AND p_type = 'LARGE'
    ), eu_supp AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ), costs AS (
        SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost
        FROM partsupp ps
        JOIN target t ON ps.ps_partkey = t.p_partkey
        JOIN eu_supp es ON ps.ps_suppkey = es.s_suppkey
    ), mins AS (
        SELECT ps_partkey, min(ps_supplycost) AS min_cost
        FROM costs GROUP BY ps_partkey
    )
    SELECT round(es.s_acctbal, 2) AS s_acctbal, es.s_name, es.n_name,
           c.ps_partkey AS p_partkey,
           round(c.ps_supplycost, 2) AS supplycost
    FROM costs c
    JOIN mins m ON c.ps_partkey = m.ps_partkey
               AND c.ps_supplycost = m.min_cost
    JOIN eu_supp es ON c.ps_suppkey = es.s_suppkey
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (correlated-min subquery): for EUROPE suppliers of
    small (size<=15) LARGE parts, keep each part's minimum-supplycost offers.
    Adapted: p_type equality (synthetic vocabulary has no '%BRASS'
    suffixes); no mfgr/address/comment columns in the schema.

    Plan: the correlated ``ps_supplycost = (SELECT min ...)`` decorrelates
    into ONE window-min over the costs relation — no join-back of a
    per-part aggregate, no correlated re-execution. Only the fixed-size
    nation/region dims are hint-broadcast; the part-filtered target and
    the supplier semi-join side scale with SF and are left to AQE.
    Min-cost equality on doubles is safe because both sides are the
    SAME synthesized value."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    target = part.where((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")).select(
        "p_partkey"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(
            F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_keys = eu_supp.select(F.col("s_suppkey").alias("__eu_key"))
    costs = (
        ps.join(target, ps.ps_partkey == target.p_partkey)
        .join(eu_keys, ps.ps_suppkey == F.col("__eu_key"), "left_semi")
    )
    w = Window.partitionBy("ps_partkey")
    best = costs.withColumn("min_cost", F.min("ps_supplycost").over(w)).where(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return best.join(eu_supp, best.ps_suppkey == eu_supp.s_suppkey).select(
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "s_name",
        "n_name",
        F.col("ps_partkey").alias("p_partkey"),
        F.round("ps_supplycost", 2).alias("supplycost"),
    )


# =============================================================================
# q9: product-type profit
# =============================================================================


@q(
    "q9_product_profit",
    f"""
    WITH {_PS_SQL}
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(sum(
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
               - CAST(ps.ps_supplycost AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(18,2))
           ), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN partsupp ps ON ps.ps_suppkey = l.l_suppkey
                    AND ps.ps_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (profit by nation and year): revenue minus supply
    cost across the full join graph. Adapted: p_type = 'PROMO' instead of
    p_name LIKE '%green%'. All money math in DECIMAL (exact under any
    summation order); the partsupp join keeps only lineitems whose
    (part, supplier) pair exists in the synthesized table — same rows in
    both engines by construction.

    Plan: lineitem shuffles on the join keys; nation (fixed 25 rows) is
    the only FORCED broadcast — part/supplier/partsupp all scale with SF
    (partsupp is 4x|part|), so their strategy is left to AQE, which
    broadcasts them at test scale and shuffle-joins at 100 TB. Forcing
    broadcast there would be the scale-killer this corpus pins against."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    profit = (
        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
        - _dec("ps_supplycost") * _dec("l_quantity")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            ps,
            (F.col("ps_suppkey") == li.l_suppkey)
            & (F.col("ps_partkey") == li.l_partkey),
        )
        .join(part, part.p_partkey == li.l_partkey)
        .join(od, od.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


# =============================================================================
# q11: important stock identification
# =============================================================================


@q(
    "q11_important_stock",
    f"""
    WITH {_PS_SQL},
    natps AS (
        SELECT ps.ps_partkey,
               CAST(ps.ps_supplycost AS DECIMAL(18,2)) * ps.ps_availqty
                   AS value
        FROM partsupp ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
    )
    SELECT ps_partkey,
           CAST(round(sum(value), 2) AS DOUBLE) AS value
    FROM natps
    GROUP BY ps_partkey
    HAVING sum(value) > (SELECT sum(value) * 0.0001 FROM natps)
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (group-total vs global-scalar HAVING): per-part
    stock value within one nation, kept when above a fraction of the
    nation's total. DECIMAL value products are exact, so both the group
    sums and the global threshold are bit-identical across engines.

    Plan: the global scalar is a 1-row broadcast crossJoin (no second
    pass over natps from the driver); one keyed agg on ps_partkey."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    natps = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select(
            "ps_partkey",
            (_dec("ps_supplycost") * F.col("ps_availqty")).alias("value"),
        )
    )
    grouped = natps.groupBy("ps_partkey").agg(F.sum("value").alias("__sum"))
    total = natps.agg(F.sum("value").alias("__total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .where(F.col("__sum") > F.col("__total") * 0.0001)
        .select(
            "ps_partkey",
            F.round("__sum", 2).cast("double").alias("value"),
        )
    )


# =============================================================================
# q16: parts/supplier relationship
# =============================================================================


@q(
    "q16_supplier_relationship",
    f"""
    WITH {_PS_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 shape (distinct-supplier counts with a NOT-IN
    exclusion): supplier variety per (brand, type, size) bucket.
    Adapted: the complaints exclusion is a deterministic modulo stand-in
    (schema has no s_comment).

    Plan: the NOT IN lowers to a broadcast left-anti join (the excluded
    set is ~8 keys — a genuinely tiny, SF-independent side); the part
    join is AQE's call; one distinct-agg shuffle on the group key."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 13 == 0)
        .select("s_suppkey")
    )
    return (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            ps.ps_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


# =============================================================================
# q20: potential part promotion
# =============================================================================


@q(
    "q20_potential_promotion",
    f"""
    WITH {_PS_SQL},
    shipped AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE year(l_shipdate) = 1997
        GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN partsupp ps ON ps.ps_suppkey = s.s_suppkey
    JOIN part p ON p.p_partkey = ps.ps_partkey
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                   AND sh.l_suppkey = ps.ps_suppkey
    WHERE n.n_name = 'NATION_6'
      AND p.p_type = 'SMALL'
      AND 2 * ps.ps_availqty > sh.qty
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape (nested semi-join chain): NATION_6 suppliers whose
    stock of SMALL parts exceeds half of what they shipped in 1997.
    Adapted: ``2*availqty > qty`` keeps the comparison in exact
    integer/DECIMAL arithmetic (``availqty > 0.5*qty`` would compare
    against an order-dependent double).

    Plan: shipped is a keyed agg of the 1997 lineitem slice; nation is
    the only forced broadcast (partsupp/part scale with SF — AQE decides
    for them); the DISTINCT collapses the per-part hits into supplier
    rows — no correlated subqueries survive."""
    ps = _partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate") == 1997
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("qty")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_6")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(ps, F.col("ps_suppkey") == supp.s_suppkey)
        .join(part, part.p_partkey == F.col("ps_partkey"))
        .join(
            shipped,
            (shipped.l_partkey == F.col("ps_partkey"))
            & (shipped.l_suppkey == F.col("ps_suppkey")),
        )
        .where(2 * F.col("ps_availqty") > F.col("qty"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
