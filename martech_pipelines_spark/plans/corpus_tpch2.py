"""Corpus batch 4: deeper TPC-H-shaped relational coverage (§2.J widening)
— nation-pair trade volume, distribution histograms, share-of-total,
window-vs-group correlated aggregates, and anti-join dormancy, each
adapted to the synthetic schema (no partsupp/comment/phone columns) and
each with a full DuckDB oracle.

Same oracle-portability ground rules as corpus.py: DECIMAL money sums
rounded in decimal space, 4dp ratios, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import q
from martech_pipelines_spark.sources import load_table


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


_REV_DUCK = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
_REV_SPARK = lambda: _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))  # noqa: E731


@q(
    "q7_nation_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(date_part('year', l_shipdate) AS INTEGER) AS l_year,
           CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship-year. Both nation dims and the supplier dim broadcast; the only
    big shuffle is the lineitem->orders join, and the nation IN-filters
    semi-reduce both fact sides before it."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cust, od.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_REV_SPARK()), 2).cast("double").alias("revenue"))
    )


@q(
    "q13_order_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count histogram, zero-order
    customers included (left join + count of the nullable key). Two
    keyed aggregations; the second groups on a tiny integer domain, so
    map-side combine collapses it before the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(od, od.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@q(
    "q14_promo_share",
    f"""
    SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_DUCK} ELSE 0 END)
                      / sum({_REV_DUCK}), 4) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share for one month. The part dim
    broadcasts; share computed as one conditional aggregate pair —
    DECIMAL sums, ratio rounded at 4dp for cross-engine stability."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = _REV_SPARK()
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            / F.sum(rev),
            4,
        )
        .cast("double")
        .alias("promo_revenue_pct")
    )


@q(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue. The
    per-supplier revenue CTE aggregates lineitem ONCE; the scalar max is
    a 1-row aggregate of that table crossJoin-broadcast back onto it —
    no global rank window (which would single-partition |suppliers|
    rows) and no second lineitem scan. The revenue table is persisted
    for its two consumers and released by the caller."""
    from pyspark.storagelevel import StorageLevel

    from martech_pipelines_spark import caching

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = caching.register(
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_REV_SPARK()), 2).cast("double").alias("total_revenue"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__mx"))
        .drop("__mx")
    )
    return (
        supp.join(top, supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "q17_small_qty_revenue",
    """
    WITH part_avg AS (
        SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < qty_cut
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand. The correlated per-part average becomes ONE window over
    l_partkey (no join-back, no second lineitem scan); the brand filter
    broadcasts from the part dim."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    w = Window.partitionBy("l_partkey")
    with_cut = li.withColumn("qty_cut", F.lit(0.2) * F.avg("l_quantity").over(w))
    return (
        with_cut.join(part, with_cut.l_partkey == part.p_partkey)
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(_dec("l_extendedprice")) / F.lit(7.0))
            .cast("decimal(28,8)")
            .alias("__s")
        )
        .select(F.round("__s", 2).cast("double").alias("avg_yearly"))
    )


@q(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (schema-adapted: market segment stands in for the
    phone country code): well-funded customers with no RECENT orders —
    the recency cutoff keeps the result non-empty at every SF (an
    all-history NOT EXISTS matches nobody in the synthetic data, and a
    0-row oracle match is vacuous). The scalar average broadcasts via
    crossJoin of a 1-row aggregate; the no-orders test is a LEFT ANTI
    join against the date-filtered orders — never a per-row subquery."""
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2000-01-01"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(od, cust.c_custkey == od.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


@q(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
                      / CAST(sum(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
               {_REV_DUCK} AS volume,
               n2.n_name AS nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of PROMO revenue sold
    into ASIA customers, per year. Every dimension (part, customer,
    supplier, nation x2, region) broadcasts; lineitem->orders is the one
    shuffle join; the share is a conditional-aggregate pair — DECIMAL
    sums cast to DOUBLE before the 4dp-rounded division so both engines
    perform the same single IEEE divide."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    joined = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1.n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n2), F.col("n2.n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n1.n_regionkey"))
    )
    vol = _REV_SPARK()
    return (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0)))
                .cast("double")
                / F.sum("volume").cast("double"),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@q(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 10 AND l_quantity BETWEEN 1  AND 15)
       OR (p_brand = 'Brand#7'  AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape (adapted: no p_container column): revenue under an
    OR-of-ANDs mixing both join sides. Catalyst extracts the common
    p_brand IN-list as a pushable conjunct for the broadcast part scan
    while the full disjunction evaluates post-join — the classic CNF
    partial-pushdown pattern this query exists to exercise."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    b = F.col("p_brand")
    sz = F.col("p_size")
    qty = F.col("l_quantity")
    pred = (
        ((b == "Brand#1") & sz.between(1, 10) & qty.between(1, 15))
        | ((b == "Brand#7") & sz.between(11, 25) & qty.between(10, 30))
        | ((b == "Brand#13") & sz.between(26, 50) & qty.between(20, 50))
    )
    return joined.where(pred).agg(
        F.round(F.sum(_REV_SPARK()), 2).cast("double").alias("revenue")
    )


@q(
    "q21_waiting_suppliers",
    """
    WITH li_o AS (
        SELECT l_orderkey, l_suppkey,
               (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
        FROM li_o GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li_o
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE late AND n_supp >= 2 AND n_late_supp = 1
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (adapted: late = shipped >60 days after order
    date, standing in for the absent commit/receipt dates): suppliers who
    were the SOLE late supplier on a multi-supplier finished order. The
    EXISTS / NOT-EXISTS pair is re-expressed as one per-order aggregate
    (n_supp, n_late_supp) joined back — two scans of the same filtered
    join instead of three correlated subqueries, the decorrelated plan
    Catalyst wants."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    li_o = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).alias("late"),
    )
    per_order = li_o.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        li_o.where("late")
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


@q(
    "mart3_last_touch",
    """
    WITH ann AS (
        SELECT event_id, user_id, event_type, ts,
               last_value(CASE WHEN event_type IN ('view', 'click') THEN event_id END IGNORE NULLS)
                   OVER w AS touch_id,
               last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
                   OVER w AS touch_type,
               last_value(CASE WHEN event_type IN ('view', 'click') THEN epoch_us(ts) END IGNORE NULLS)
                   OVER w AS touch_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, touch_id, touch_type,
           CAST(epoch_us(ts) - touch_us AS BIGINT) AS gap_us
    FROM ann
    WHERE event_type = 'purchase'
      AND touch_us IS NOT NULL
      AND epoch_us(ts) - touch_us <= 604800000000::BIGINT
    """,
)
def mart3_last_touch(spark, sf_dir):
    """Last-touch attribution: every purchase credited to the user's most
    recent view/click within a 7-day lookback. ONE window pass over the
    event stream (shuffle on user_id only) instead of the naive
    purchases-x-touches range join — `last(..., ignorenulls)` carries the
    latest touch forward, so cost is a sort within user partitions
    regardless of touch fan-in. Deterministic order (ts, event_id);
    the gap compares exact integer microseconds in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    is_touch = F.col("event_type").isin("view", "click")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ann = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True).over(w).alias("touch_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w).alias("touch_type"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True).over(w).alias("touch_us"),
    )
    return (
        ann.where(
            (F.col("event_type") == "purchase")
            & F.col("touch_us").isNotNull()
            & (F.col("us") - F.col("touch_us") <= 7 * 86400 * 1000000)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "touch_id",
            "touch_type",
            (F.col("us") - F.col("touch_us")).cast("long").alias("gap_us"),
        )
    )
