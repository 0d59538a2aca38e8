"""TPC-H breadth queries (q07-q22, adapted to the testdata star schema).

These widen the relational coverage of SURVEY.md §2.6 — the compute the
reference delegates to its host engine (joins of every multiplicity,
correlated EXISTS/NOT EXISTS, global-scalar HAVING, top-k with ties,
left-join histograms). The testdata schema (TESTDATA.md) lacks `partsupp`,
`l_commitdate`/`l_receiptdate`, `l_shipmode`, and `c_phone`, so q11/q12/
q16/q21/q22 are adapted to equivalent plan shapes over the available
columns; q04's shape already exists as ``q_order_priority_exists``.

Money math uses the exact BIGINT-cents macros from
:mod:`delta_sharing_spark.workloads.relational` so Spark and the DuckDB
oracle agree bit-for-bit.

Scale notes (100 TB): every query's big side is lineitem (or
lineitem ⋈ orders on the shared orderkey); nation/region/supplier are
broadcast, part/customer joins stay plain equi-joins so AQE can pick
broadcast at small SF and shuffle-hash at large SF. Top-k queries end in
TakeOrderedAndProject (no global sort). Scalar subqueries (q11 total,
q15 max, q22 avg) are 1-row aggregates broadcast into the filter — never
a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sharing_spark.io import read_table
from delta_sharing_spark.workloads import workload
from delta_sharing_spark.workloads.relational import (
    DISC_PRICE_C,
)

_HIGH_PRIO = ("1-URGENT", "2-HIGH")


# --------------------------------------------------------------------- q07

@workload(
    "q07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol_c) AS DOUBLE) / 10000 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               {DISC_PRICE_C} AS vol_c
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    Two aliased broadcast joins against nation (supplier side and customer
    side); the only shuffle is lineitem ⋈ orders on orderkey. The nation
    pair filter lands *after* the broadcasts, so Catalyst pushes each
    nation's half down to its own join."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(F.expr(DISC_PRICE_C)).cast("double") / 10000).alias("revenue"))
    )


# --------------------------------------------------------------------- q08

@workload(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END)
                AS DOUBLE)
           / CAST(SUM(vol_c) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               n2.n_name AS supp_nation,
               {DISC_PRICE_C} AS vol_c
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue into ASIA.
    The numerator/denominator are both exact cents sums cast to double, so
    the division is bit-identical across engines. part is filtered to one
    p_type before the join (selective enough to broadcast at any SF)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.expr(DISC_PRICE_C)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------- q09

@workload(
    "q09_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({DISC_PRICE_C}) AS DOUBLE) / 10000 AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
    """,
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit adapted to discounted revenue — the testdata
    has no partsupp/supplycost): revenue on '%red%' parts by supplier
    nation and order year. LIKE-filtered part broadcasts; lineitem ⋈ orders
    is the one big shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg((F.sum(F.expr(DISC_PRICE_C)).cast("double") / 10000).alias("sum_profit"))
    )


# --------------------------------------------------------------------- q10

@workload(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({DISC_PRICE_C}) AS DOUBLE) / 10000 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned revenue in a quarter.
    Ends in TakeOrderedAndProject (top-k, no global sort); revenue is exact
    cents so the DESC order + custkey tie-break is deterministic across
    engines."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(F.expr(DISC_PRICE_C)).cast("double") / 10000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------- q11

@workload(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey AS partkey, SUM({DISC_PRICE_C}) AS val_c
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    ), tot AS (SELECT SUM(val_c) AS tot_c FROM pv)
    SELECT partkey, CAST(val_c AS DOUBLE) / 10000 AS part_value
    FROM pv, tot
    WHERE val_c * 1000 > tot_c
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp — value adapted to discounted revenue
    via one nation's suppliers): parts whose value exceeds 0.1% of the
    total. The global total is a 1-row aggregate broadcast back in via
    crossJoin; the fraction compare runs on exact BIGINT cents
    (val_c * 1000 > tot_c), never on floats."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.expr(DISC_PRICE_C)).alias("val_c"))
    )
    tot = pv.agg(F.sum("val_c").alias("tot_c"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("val_c") * 1000 > F.col("tot_c"))
        .select("partkey", (F.col("val_c").cast("double") / 10000).alias("part_value"))
    )


# --------------------------------------------------------------------- q12

@workload(
    "q12_late_shipments",
    oracle="""
    SELECT CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS ship_month,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_month
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode adapted to a late-shipment predicate — the
    testdata has no l_shipmode/receiptdate): lines shipped >90 days after
    their order, split by priority class per ship month. The non-equi
    date predicate evaluates *after* the equi-join on orderkey, inside the
    join's post-condition — no nested-loop join appears."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin(*_HIGH_PRIO)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------- q13

@workload(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over customers, including
    zero-order customers via the left join (COUNT of a null key is 0).
    Two shuffles: custkey then the tiny c_count regroup."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------- q14

@workload(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE_C} ELSE 0 END)
                AS DOUBLE) * 100
           / CAST(SUM({DISC_PRICE_C}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO revenue share in one month. One broadcast join
    (part), one 1-row aggregate; the percentage is (exact → double) * 100
    / (exact → double) with identical op order on both engines."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    vol = F.expr(DISC_PRICE_C)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))).cast(
                    "double"
                )
                * 100
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------- q15

@workload(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({DISC_PRICE_C}) AS rev_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 10000 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_c = (SELECT MAX(rev_c) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue. The MAX
    scalar subquery is a 1-row aggregate broadcast back onto the revenue
    view (computed once, reused for both sides); the equality compare is
    on exact cents so ties are genuine ties."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.expr(DISC_PRICE_C)).alias("rev_c")
    )
    top = revenue.agg(F.max("rev_c").alias("max_c"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("rev_c") == F.col("max_c"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10000).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------- q16

@workload(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp reconstructed as the distinct
    (partkey, suppkey) pairs observed in lineitem): supplier counts per
    brand/type/size bucket. The distinct and the count-distinct both
    shuffle on partkey-derived keys; part is filter-then-broadcast."""
    ps = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------- q19

@workload(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({DISC_PRICE_C}) AS DOUBLE) / 10000 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity brackets. The OR spans
    both sides of the join, so it stays a join post-condition; Catalyst
    still derives the implied single-side prefilters (brand IN ...,
    quantity range union) for pushdown."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 10) & q.between(1, 11))
        | ((br == "Brand#2") & sz.between(1, 15) & q.between(10, 20))
        | ((br == "Brand#3") & sz.between(1, 20) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(F.expr(DISC_PRICE_C)).cast("double") / 10000).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------- q21

@workload(
    "q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS sup_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_supp, SUM(sup_late) AS n_late
        FROM fl GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM fl
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON fl.l_suppkey = s_suppkey
    WHERE fl.sup_late = 1 AND per_order.n_supp > 1 AND per_order.n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >60 days after order — the testdata
    has no commit/receipt dates): suppliers who were the *sole* late
    supplier on a multi-supplier finished order. The correlated
    EXISTS/NOT EXISTS pair is re-expressed as two aggregations over the
    same orderkey partitioning — the per-(order, supplier) rollup and the
    per-order rollup share their shuffle key, so the self-join is
    co-partitioned (no extra exchange at scale)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = read_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    fl = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("sup_late"))
    )
    per_order = fl.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("sup_late").alias("n_late")
    )
    return (
        fl.filter(F.col("sup_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------- q22

@workload(
    "q22_dormant_customers",
    oracle="""
    WITH pos AS (
        SELECT c_custkey, c_nationkey % 5 AS cgrp,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2)
    ), avg_t AS (
        SELECT SUM(bal_c) AS sum_c, COUNT(*) AS n FROM pos
    )
    SELECT cgrp, COUNT(*) AS numcust,
           CAST(SUM(bal_c) AS DOUBLE) / 100 AS totacctbal
    FROM pos, avg_t
    WHERE bal_c * n > sum_c
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = pos.c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-06-01 00:00:00')
    GROUP BY cgrp
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (country code adapted to nationkey % 5 — no c_phone
    in the testdata): wealthy customers with no *recent* orders (none since
    1999-06-01), grouped by country group. The above-average test runs on
    exact cents (bal_c * n > sum_c, BIGINT both sides — no float average),
    the NOT EXISTS is a left-anti join on custkey against the date-filtered
    orders, and the AVG subquery is a broadcast 1-row aggregate."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-06-01 00:00:00").cast("timestamp")
    )
    pos = cust.filter(
        (F.col("c_acctbal") > 0.0) & ((F.col("c_nationkey") % 5).isin(0, 1, 2))
    ).select(
        "c_custkey",
        (F.col("c_nationkey") % 5).alias("cgrp"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    avg_t = pos.agg(F.sum("bal_c").alias("sum_c"), F.count("*").alias("n"))
    return (
        pos.crossJoin(F.broadcast(avg_t))
        .filter(F.col("bal_c") * F.col("n") > F.col("sum_c"))
        .join(orders, pos.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cgrp")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_c").cast("double") / 100).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------- q02

@workload(
    "q02_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 // CAST(ROUND(l_quantity) AS BIGINT)) AS cost_c
      FROM lineitem GROUP BY 1, 2
    ),
    rcost AS (
      SELECT partkey, suppkey, cost_c, s_acctbal, s_name, n_name
      FROM cost
      JOIN supplier ON suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    minc AS (SELECT partkey, MIN(cost_c) AS min_c FROM rcost GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, partkey, p_type,
           CAST(cost_c AS BIGINT) AS cost_c
    FROM rcost JOIN minc USING (partkey)
    JOIN part ON partkey = p_partkey
    WHERE cost_c = min_c
    ORDER BY s_acctbal DESC, n_name, s_name, partkey
    LIMIT 100
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q02 shape (no partsupp — supply cost adapted to each
    supplier's best observed unit price, exact integer cents DIV units):
    per part, the European supplier(s) achieving the minimum cost — the
    decorrelated MIN subquery (aggregate per part, join back on equality),
    Q02's signature plan. Dims broadcast; top-100 ends in
    TakeOrderedAndProject."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE")
    part = read_table(spark, sf_dir, "part")
    cost = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"))
        .agg(F.min(F.expr(
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
            " DIV CAST(ROUND(l_quantity) AS BIGINT)")).alias("cost_c"))
    )
    rcost = (
        cost.join(F.broadcast(supp), cost.suppkey == supp.s_suppkey)
        .join(F.broadcast(nation),
              supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region),
              nation.n_regionkey == region.r_regionkey)
        .select("partkey", "suppkey", "cost_c",
                "s_acctbal", "s_name", "n_name")
    )
    minc = rcost.groupBy("partkey").agg(F.min("cost_c").alias("min_c"))
    return (
        rcost.join(minc, "partkey")
        .filter(F.col("cost_c") == F.col("min_c"))
        .join(part, F.col("partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "partkey", "p_type",
                F.col("cost_c").cast("long").alias("cost_c"))
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


# --------------------------------------------------------------------- q20

@workload(
    "q20_potential_promotion",
    oracle="""
    WITH rp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    sq AS (
      SELECT l_suppkey AS suppkey, l_partkey AS partkey,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
      FROM lineitem JOIN rp ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    tot AS (SELECT partkey, SUM(qty) AS tot_qty FROM sq GROUP BY 1),
    dom AS (
      SELECT DISTINCT suppkey FROM sq JOIN tot USING (partkey)
      WHERE qty * 2 > tot_qty
    )
    SELECT s_suppkey, s_name FROM supplier
    JOIN dom ON s_suppkey = suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp.availqty — the 'more than half'
    threshold adapted to dominant suppliers: shipped more than half of a
    red part's 1997 volume): part-name filter, per-(supplier, part)
    aggregate, correlated per-part half-total threshold, then a SEMI join
    into supplier — Q20's nested-IN plan decorrelated. Integer-exact
    quantities; part filter and nation dim broadcast."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")).select("p_partkey")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3")
    sq = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"),
                 F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.expr("CAST(ROUND(l_quantity) AS BIGINT)"))
             .alias("qty"))
    )
    tot = sq.groupBy("partkey").agg(F.sum("qty").alias("tot_qty"))
    dom = (sq.join(tot, "partkey")
           .filter(F.col("qty") * 2 > F.col("tot_qty"))
           .select("suppkey").distinct())
    return (
        supp.join(dom, supp.s_suppkey == dom.suppkey, "left_semi")
        .join(F.broadcast(nation),
              F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name")
    )
