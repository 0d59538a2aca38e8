"""Relational workloads — the compute the reference inherits from its host
engine (SURVEY.md §2.6: joins, aggregation, windows, sorts, set ops, scalar
functions all run in Spark/pandas *after* load_as_spark/load_as_pandas).

Style: DataFrame API with Catalyst-friendly shapes — filters early (pushed to
the parquet scan), broadcast hints on dimension tables, decimal-exact money
arithmetic shared verbatim with the DuckDB oracles.

Scale notes (100 TB): every join here either broadcasts a dimension (nation/
region/customer-sized) or equi-joins on a high-cardinality key that AQE can
shuffle-balance; aggregations are partial-aggregated map-side by Catalyst;
no query collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_sharing_spark.io import read_table
from delta_sharing_spark.workloads import workload

# Exact-money building blocks: identical text evaluates identically in Spark
# and DuckDB (all inputs are 2-decimal values stored as doubles).
QTY = "CAST(l_quantity AS DECIMAL(12,2))"
PRICE = "CAST(l_extendedprice AS DECIMAL(14,2))"
DISC_1 = "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
TAX_1 = "(CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"
DISC_PRICE = f"({PRICE} * {DISC_1})"
CHARGE = f"({DISC_PRICE} * {TAX_1})"

# Cents-integer money for the hot aggregation queries: BIGINT cents stay in
# whole-stage codegen as plain long arithmetic (~2x faster than decimal
# aggregation buffers) and remain EXACT — all money inputs are 2-decimal
# values stored as doubles (measured max |x*100 - round(x*100)| < 1e-9), so
# ROUND(x*100) recovers the integer cents and integer sums are exact and
# order-independent. Verified bit-identical to the decimal forms AND across
# Spark/DuckDB. Headroom: CHARGE_C ≤ ~1.1e11 per row, so a single BIGINT
# group sum overflows only past ~8e7 rows/group x 1e3 SF — switch the sum
# to DECIMAL(38,0) for exabyte-scale groups.
QTY_I = "CAST(ROUND(l_quantity) AS BIGINT)"  # quantities are integral
PRICE_C = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
DISC_C = "CAST(ROUND(l_discount * 100) AS BIGINT)"
TAX_C = "CAST(ROUND(l_tax * 100) AS BIGINT)"
DISC_PRICE_C = f"({PRICE_C} * (100 - {DISC_C}))"  # money x 1e4
CHARGE_C = f"({DISC_PRICE_C} * (100 + {TAX_C}))"  # money x 1e6


# --------------------------------------------------------------------- q01

@workload(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({QTY_I}) AS DOUBLE)                         AS sum_qty,
           CAST(SUM({PRICE_C}) AS DOUBLE) / 100                 AS sum_base_price,
           CAST(SUM({DISC_PRICE_C}) AS DOUBLE) / 10000          AS sum_disc_price,
           CAST(SUM({CHARGE_C}) AS DOUBLE) / 1000000            AS sum_charge,
           CAST(SUM({QTY_I}) AS DOUBLE) / COUNT(*)              AS avg_qty,
           CAST(SUM({PRICE_C}) AS DOUBLE) / 100 / COUNT(*)      AS avg_price,
           CAST(SUM({DISC_C}) AS DOUBLE) / 100 / COUNT(*)       AS avg_disc,
           COUNT(*)                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-by with 8 aggregates. Catalyst pushes
    the shipdate filter into the parquet scan and partial-aggregates map-side;
    at 100 TB this is a single shuffle of ~6 tiny groups. Money runs as
    BIGINT cents (exact, codegen-friendly — see the macro block above)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(QTY_I)).cast("double").alias("sum_qty"),
            (F.sum(F.expr(PRICE_C)).cast("double") / 100)
            .alias("sum_base_price"),
            (F.sum(F.expr(DISC_PRICE_C)).cast("double") / 10000)
            .alias("sum_disc_price"),
            (F.sum(F.expr(CHARGE_C)).cast("double") / 1000000)
            .alias("sum_charge"),
            (F.sum(F.expr(QTY_I)).cast("double") / F.count("*"))
            .alias("avg_qty"),
            (F.sum(F.expr(PRICE_C)).cast("double") / 100 / F.count("*"))
            .alias("avg_price"),
            (F.sum(F.expr(DISC_C)).cast("double") / 100 / F.count("*"))
            .alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------- q03

@workload(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({DISC_PRICE_C}) AS DOUBLE) / 10000 AS revenue,
           CAST(o_orderdate AS VARCHAR)      AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k.
    ``customer`` is broadcast (small side), lineitem↔orders is the one real
    shuffle; the final top-10 is a TakeOrdered, not a full sort."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(F.expr(DISC_PRICE_C)).cast("double") / 10000)
             .alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------- q05

@workload(
    "q05_region_nation_revenue",
    oracle=f"""
    SELECT n_name, CAST(SUM({DISC_PRICE_C}) AS DOUBLE) / 10000 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q05_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with three broadcast dims. The
    region->nation->supplier chain collapses to broadcasts; only
    lineitem↔orders shuffles."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(F.expr(DISC_PRICE_C)).cast("double") / 10000)
             .alias("revenue"))
    )


# --------------------------------------------------------------------- q06

@workload(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({PRICE_C} * {DISC_C}) AS DOUBLE) / 10000 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective predicate, no join — tests that the
    conjunction is pushed into the scan (PushedFilters) so at 100 TB this
    reads a fraction of the row groups. Money as BIGINT cents."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (F.sum(F.expr(f"{PRICE_C} * {DISC_C}")).cast("double") / 10000)
        .alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# ------------------------------------------------------------------ window

@workload(
    "q_top3_orders_per_customer",
    oracle="""
    SELECT c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice, rn
    FROM (
      SELECT c_name, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: the canonical window pattern (row_number with a
    deterministic tiebreak). At scale the window shuffles once on the
    partition key — no self-join."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "rn",
        )
    )


# ---------------------------------------------------------------- semi/anti

@workload(
    "q_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS == left-semi join (TPC-H Q4 shape)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@workload(
    "q_customers_without_big_orders",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000)
    GROUP BY n_name
    """,
)
def q_customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS == left-anti join."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 350000
    )
    nation = read_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# ------------------------------------------------------------------- rollup

@workload(
    "q_rollup_returns",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM({QTY_I}) AS DOUBLE)  AS sum_qty,
           COUNT(*)                      AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(QTY_I)).cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# ------------------------------------------------------------------ set ops

@workload(
    "q_setops_segments",
    oracle="""
    WITH building AS (SELECT DISTINCT o_custkey AS k FROM orders
                      JOIN customer ON o_custkey = c_custkey
                      WHERE c_mktsegment = 'BUILDING'),
         bigspend AS (SELECT DISTINCT o_custkey AS k FROM orders
                      WHERE o_totalprice > 300000)
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT k FROM building INTERSECT SELECT k FROM bigspend)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM building EXCEPT SELECT k FROM bigspend)
    UNION ALL
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM building UNION SELECT k FROM bigspend)
    """,
)
def q_setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION DISTINCT over customer key sets."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    building = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bigspend = (
        orders.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    def tagged_count(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")) \
            .select(F.lit(op).alias("op"), "n")

    # one unioned single-row-agg plan — ONE job, no driver-side scalars
    return (
        tagged_count(building.intersect(bigspend), "intersect")
        .unionByName(tagged_count(
            building.exceptAll(bigspend).distinct(), "except"))
        .unionByName(tagged_count(
            building.union(bigspend).distinct(), "union"))
    )


# ------------------------------------------------------------ scalar funcs

@workload(
    "q_part_scalar_functions",
    oracle="""
    SELECT p_brand,
           COUNT(DISTINCT p_type)                        AS n_types,
           COUNT(DISTINCT upper(substr(p_name, 1, 4)))   AS n_prefixes,
           MAX(length(p_name))                           AS max_name_len,
           CAST(SUM(CAST(round(p_retailprice, 0) AS DECIMAL(12,0))) AS BIGINT)
                                                         AS sum_rounded_price,
           MAX(CASE WHEN p_size >= 25 THEN 'L' WHEN p_size >= 10 THEN 'M'
                    ELSE 'S' END)                        AS max_size_class
    FROM part
    GROUP BY p_brand
    """,
)
def q_part_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar expression coverage: string ops, rounding, CASE — all JVM-side
    builtins (whole-stage codegen; no Python in the hot path)."""
    part = read_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.countDistinct(F.upper(F.substring("p_name", 1, 4))).alias("n_prefixes"),
        F.max(F.length("p_name")).alias("max_name_len"),
        F.sum(F.round("p_retailprice", 0).cast("decimal(12,0)"))
        .cast("long")
        .alias("sum_rounded_price"),
        F.max(
            F.when(F.col("p_size") >= 25, "L")
            .when(F.col("p_size") >= 10, "M")
            .otherwise("S")
        ).alias("max_size_class"),
    )


# -------------------------------------------------------------- time series

@workload(
    "q_events_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of the streaming windowed
    agg): date_trunc buckets shuffle once on (hour, type)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(value AS DECIMAL(12,2))")).cast("double").alias("total_value"),
    )


@workload(
    "q_events_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + running sum over a per-user window — one shuffle
    on user_id, linear within partition. (Streaming twin: session_window.)"""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts").over(w)
    # interval comparison works for TIMESTAMP and TIMESTAMP_NTZ alike
    return (
        ev.withColumn(
            "new_session",
            F.when(prev.isNull()
                   | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
                   1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# --------------------------------------------------- correlated subqueries

@workload(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({PRICE_C}) AS DOUBLE) / 100 / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    expressed as SQL so Catalyst's subquery decorrelation rewrites it into
    an aggregate + join (no per-row subquery execution at scale)."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    read_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(f"""
        SELECT CAST(SUM({PRICE_C}) AS DOUBLE) / 100 / 7.0 AS avg_yearly,
               COUNT(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
            SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)
    """)


@workload(
    "q18_large_orders",
    oracle=f"""
    SELECT c_name, o_orderkey,
           CAST(SUM({QTY_I}) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
    GROUP BY c_name, o_orderkey
    HAVING SUM({QTY_I}) > 300
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join + GROUP BY + HAVING over an aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust = read_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey")
        .agg(F.sum(F.expr(QTY_I)).alias("__total"))
        .filter(F.col("__total") > 300)
        .select("c_name", "o_orderkey",
                F.col("__total").cast("double").alias("total_qty"))
    )


@workload(
    "q_cube_orders",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of subtotals)."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
             .cast("double") / 100).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n", "total",
        )
    )


@workload(
    "q_window_functions",
    oracle="""
    SELECT o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           CAST(LAG(o_totalprice, 1) OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice, 1) OVER w AS DOUBLE) AS next_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: rank/dense_rank/ntile/lag/lead + a running
    decimal sum — one shuffle on the partition key for all seven."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    wrun = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey").rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_totalprice", 1).over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).cast("double").alias("next_price"),
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(14,2))")).over(wrun)
        .cast("double").alias("running_total"),
    )


@workload(
    "q_events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS distinct_k
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (get_json_object — JVM-side
    JSON path, no Python)."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.countDistinct(k).alias("distinct_k"),
    )


@workload(
    "q_part_regexp",
    oracle="""
    SELECT regexp_extract(p_type, '^([a-z]+)', 1) AS type_head,
           COUNT(*) AS n,
           CAST(MIN(p_retailprice) AS DOUBLE) AS min_price,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
    FROM part
    GROUP BY 1
    """,
)
def q_part_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp extraction as a grouping key (simple character-class pattern,
    identical semantics in Java regex and RE2)."""
    part = read_table(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.regexp_extract("p_type", "^([a-z]+)", 1).alias("type_head"))
        .agg(
            F.count("*").alias("n"),
            F.min("p_retailprice").cast("double").alias("min_price"),
            F.max("p_retailprice").cast("double").alias("max_price"),
        )
    )


@workload(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, verified bit-exact)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


@workload(
    "q_datetime_functions",
    oracle="""
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           COUNT(*) AS n,
           CAST(MIN(date_diff('day', DATE '1995-01-01',
                              o_orderdate::DATE)) AS INT) AS min_days_since,
           CAST(MAX(day(o_orderdate)) AS INT) AS max_dom
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function coverage: year/month/day extraction and day
    arithmetic (grouping by calendar month)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count("*").alias("n"),
        F.min(F.datediff(F.col("o_orderdate").cast("date"),
                         F.lit("1995-01-01").cast("date")))
        .cast("int").alias("min_days_since"),
        F.max(F.dayofmonth("o_orderdate")).cast("int").alias("max_dom"),
    )


@workload(
    "q_array_functions",
    oracle="""
    SELECT label,
           CAST(SUM(len(embedding)) AS BIGINT) AS total_dims,
           CAST(SUM(list_reduce(list_transform(list_slice(embedding, 1, 8),
                x -> x::DOUBLE), (a, b) -> a + b)) AS DOUBLE) AS sum_head8,
           CAST(SUM(CASE WHEN embedding[1]::DOUBLE > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos_first
    FROM embeddings
    GROUP BY label
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage: size, slice, element access, higher-order
    fold — all JVM-side."""
    emb = read_table(spark, sf_dir, "embeddings")
    head8 = F.expr(
        "aggregate(transform(slice(embedding, 1, 8), x -> cast(x as double)), "
        "cast(0 as double), (a, b) -> a + b)")
    return emb.groupBy("label").agg(
        F.sum(F.size("embedding")).alias("total_dims"),
        F.sum(head8).cast("double").alias("sum_head8"),
        F.sum(F.when(F.element_at("embedding", 1).cast("double") > 0, 1)
              .otherwise(0)).cast("long").alias("n_pos_first"),
    )


@workload(
    "q_outer_joins",
    oracle="""
    SELECT n_name,
           CAST(COUNT(c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-aware counting (COUNT(col) vs COUNT(*))."""
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.count("*").alias("n_rows"),
        )
    )


@workload(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey AS regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (sorted collect_list + array_join — the
    deterministic form of LISTAGG)."""
    nation = read_table(spark, sf_dir, "nation")
    return nation.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",")
        .alias("nations")
    )


@workload(
    "q_in_subquery",
    oracle="""
    SELECT p_brand, COUNT(*) AS n
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    GROUP BY p_brand
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (Catalyst rewrites to a left-semi join)."""
    read_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT p_brand, COUNT(*) AS n
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity >= 49)
        GROUP BY p_brand
    """)


@workload(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not expressible as rollup or cube alone)."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
    """)


@workload(
    "q_conditional_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT CASE WHEN o_totalprice > 300000
                                    THEN o_custkey END) AS BIGINT)
             AS big_spenders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS all_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional distinct aggregation (distinct over a CASE projection)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct(
            F.when(F.col("o_totalprice") > 300000, F.col("o_custkey"))
        ).alias("big_spenders"),
        F.countDistinct("o_custkey").alias("all_customers"),
    )


@workload(
    "q_events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_signup
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click_after,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase_after
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (signup -> later click -> later purchase): each
    stage is first-event-after-previous-stage via join + min — three
    shuffles on user_id, no window over the full event stream."""
    ev = read_table(spark, sf_dir, "events")
    s1 = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t_signup")))
    s2 = (ev.filter(F.col("event_type") == "click").alias("e")
          .join(s1, "user_id")
          .filter(F.col("e.ts") > F.col("t_signup"))
          .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    s3 = (ev.filter(F.col("event_type") == "purchase").alias("e")
          .join(s2, "user_id")
          .filter(F.col("e.ts") > F.col("t_click"))
          .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    # single job: three single-row aggregates cross-joined (no driver-side
    # count() round-trips — the three stages run as one distributed plan)
    return (
        s1.agg(F.count("*").alias("n_signup"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_after")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchase_after")))
    )


@workload(
    "q_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 25) + 1 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM events
    GROUP BY 1
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (25-wide buckets; identical floor expression in
    both engines — one shuffle on bucket id)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.floor(F.col("value") / 25) + 1).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
    )


@workload(
    "q_null_handling",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN NULLIF(o_orderpriority, '3-MEDIUM') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
           COALESCE(MIN(NULLIF(o_orderpriority, '1-URGENT')), 'none')
             AS min_non_urgent
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics functions: NULLIF / COALESCE through aggregation."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
                   .isNull(), 1).otherwise(0)
        ).cast("long").alias("n_medium"),
        F.coalesce(
            F.min(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))),
            F.lit("none"),
        ).alias("min_non_urgent"),
    )


@workload(
    "q_events_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT h.hour, t.event_type FROM hours h CROSS JOIN types t),
    agg AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(g.hour AS VARCHAR) AS hour, g.event_type,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN agg a
      ON g.hour = a.hour AND g.event_type = a.event_type
    """,
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense (hour × event_type) grid built with
    ``sequence`` + explode (no driver loop), left-joined against the
    hourly aggregate so silent hours appear as explicit zero rows — what
    downstream anomaly/forecast jobs need. The grid is |hours|·|types|
    rows (tiny relative to events) and broadcast-joins the aggregate."""
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour"))
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    return (
        grid.join(agg, ["hour", "event_type"], "left")
        .select(F.col("hour").cast("string").alias("hour"), "event_type",
                F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )
