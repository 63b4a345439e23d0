"""Generic relational plans over the TPC-H-ish testdata tables.

These cover the reference's relational surface at scale: scan → filter →
hash-aggregate (A1-A7 shapes), fact×dim broadcast joins (J1/J2),
top-k (W1/W2/A4). Star-schema joins broadcast the dimension side so the
fact table never shuffles; aggregates rely on partial (map-side)
aggregation before the single hash shuffle.

Float-stability: every aggregate over doubles is rounded identically on
both sides so the driver's value-hash comparison is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .spec import QuerySpec


def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan, 6-group hash aggregate.

    Filter reaches the parquet scan as a pushed-down predicate; all
    arithmetic stays in whole-stage codegen.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join orders⋈customer⋈nation⋈region with broadcast dims.

    orders (fact) is never shuffled for the join: customer/nation/region
    all broadcast. One hash-agg shuffle on the 25-key nation grouping.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("order_cnt"),
        )
    )


_REVENUE_SQL = """
SELECT r_name, n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def _top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W2 shape at scale: aggregate then TakeOrderedAndProject.

    Ordering uses the ROUNDED revenue + custkey tie-break so the top-10
    SET is engine-independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    agg = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("order_cnt"),
    )
    return (
        agg.join(F.broadcast(customer.select("c_custkey", "c_name")),
                 agg.o_custkey == customer.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"), "c_name", "revenue", "order_cnt"
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(10)
    )


_TOP_CUSTOMERS_SQL = """
SELECT c_custkey AS custkey, c_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS order_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, custkey ASC
LIMIT 10
"""


def _order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join shape (TPC-H Q4 flavor): orders having ≥1 lineitem
    received after ship date, counted per priority. The semi-join
    avoids materializing the (much larger) join result."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_cnt"))
    )


_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_cnt
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def _events_enriched_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+W1 — fact×dim left broadcast join + latest-N top-k with
    deterministic tie-break (FIXTURES.md decision #3)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
            events.user_id == customer.c_custkey,
            "left",
        )
        .select("event_id", "ts", "user_id", "event_type", "value",
                "c_name", "c_mktsegment")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
    )


_EVENTS_ENRICHED_SQL = """
SELECT event_id, ts, user_id, event_type, value, c_name, c_mktsegment
FROM events
LEFT JOIN customer ON user_id = c_custkey
ORDER BY ts DESC, event_id DESC
LIMIT 50
"""


def _revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation): subtotal + grand-total rows with
    NULL fill — free from Spark SQL, absent from the reference
    (SURVEY.md §2.4 note on grouping sets)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("order_cnt"),
        )
    )


_ROLLUP_SQL = """
SELECT r_name, n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def _customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (no anti join exists in the
    reference; required for a complete relational surface). Scoped to
    urgent orders so the result is non-empty at every scale factor."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.join(
            urgent, customer.c_custkey == F.col("o_custkey"), "left_anti"
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


def _status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (A9's one-pass histogram generalized): order counts per
    priority pivoted on the fixed status domain."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders GROUP BY o_orderpriority
"""


def _customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many orders
    they placed, INCLUDING the zero-order customers only an OUTER
    join can see (the reason Q13 can't be an inner-join rollup).
    Two-level aggregate: per-customer count → count of customers per
    count. Both levels map-side combine; the second level's key space
    is bounded by max orders per customer."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


_Q13_SQL = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def _large_volume_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q18 shape: the aggregate-then-semi-join decorrelation —
    orders whose total lineitem quantity exceeds a threshold, joined
    back to their customer. The HAVING aggregate reduces lineitem to
    qualifying order keys FIRST (a tiny set), so the orders/customer
    joins touch qualifiers only. Quantities sum as exact integer
    millis — the threshold can never flip on float fold order."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    qty_m = F.floor(F.col("l_quantity") * 1000).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_m).alias("sum_qty_millis"))
        .filter(F.col("sum_qty_millis") > 150_000)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "sum_qty_millis",
            F.round(F.col("sum_qty_millis") / 1000.0, 3).alias(
                "total_qty"
            ),
        )
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_quantity * 1000) AS BIGINT)) AS BIGINT)
           AS sum_qty_millis
  FROM lineitem GROUP BY l_orderkey
  HAVING sum_qty_millis > 150000
)
SELECT c_custkey, c_name, o_orderkey, sum_qty_millis,
       round(sum_qty_millis / 1000.0, 3) AS total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def _small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 shape: the correlated-aggregate subquery
    (l_quantity < 0.2 · avg quantity of the same part) decorrelated
    into a per-part aggregate joined back. The comparison is EXACT
    integer algebra — qty < 0.2·(sum/cnt) ⟺ 5·qty·cnt < sum on
    millis — so no row can flip on cross-engine float division, and
    the revenue output is an exact millis sum."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_m = F.floor(F.col("l_quantity") * 1000).cast("long")
    price_m = F.floor(F.col("l_extendedprice") * 1000).cast("long")
    base = li.select(
        "l_partkey", qty_m.alias("qty_m"), price_m.alias("price_m")
    )
    per_part = base.groupBy("l_partkey").agg(
        F.sum("qty_m").alias("sum_q"), F.count("*").alias("cnt_q")
    )
    picked = base.join(per_part, "l_partkey").filter(
        F.col("qty_m") * 5 * F.col("cnt_q") < F.col("sum_q")
    )
    return picked.agg(
        F.count("*").alias("n_lines"),
        F.sum("price_m").alias("revenue_millis"),
        F.round((F.sum("price_m") / 7.0) / 1000.0, 3).alias(
            "avg_yearly"
        ),
    )


_Q17_SQL = """
WITH base AS (
  SELECT l_partkey,
         CAST(floor(l_quantity * 1000) AS BIGINT) AS qty_m,
         CAST(floor(l_extendedprice * 1000) AS BIGINT) AS price_m
  FROM lineitem
),
per_part AS (
  SELECT l_partkey, CAST(sum(qty_m) AS BIGINT) AS sum_q,
         count(*)::BIGINT AS cnt_q
  FROM base GROUP BY l_partkey
)
SELECT count(*)::BIGINT AS n_lines,
       CAST(sum(price_m) AS BIGINT) AS revenue_millis,
       round((CAST(sum(price_m) AS BIGINT) / 7.0) / 1000.0, 3)
         AS avg_yearly
FROM base JOIN per_part USING (l_partkey)
WHERE qty_m * 5 * cnt_q < sum_q
"""


def _sole_returning_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation —
    suppliers who returned a line on a multi-supplier order where NO
    OTHER supplier returned one (the 'who alone kept the order
    waiting' pattern). Decorrelated to ONE per-order aggregate
    (distinct suppliers, distinct returning suppliers) joined back to
    the returning rows — the quadruple self-join the literal SQL
    implies never happens."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    returning = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        returning.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    )
    return sole.groupBy("l_suppkey").agg(
        F.count("*").alias("numwait")
    )


_Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey)::BIGINT AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R'
                             THEN l_suppkey END)::BIGINT AS n_ret_supp
  FROM lineitem GROUP BY l_orderkey
),
ret AS (
  -- 'returning' is a reserved word (RETURNING clause)
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem WHERE l_returnflag = 'R'
)
SELECT l_suppkey, count(*)::BIGINT AS numwait
FROM ret JOIN per_order USING (l_orderkey)
WHERE n_supp >= 2 AND n_ret_supp = 1
GROUP BY l_suppkey
"""


def _cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: argmin-per-group decorrelation — for each
    (filtered) part, the supplier rows achieving that part's MINIMUM
    price. One window min over the part key replaces the correlated
    scalar subquery (no per-part re-scan); equality against the min
    is EXACT cross-engine because the min is an element of the
    column, never arithmetic. Part dim filters broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    from pyspark.sql import Window

    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("_minp", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_minp"))
        .select(
            "p_partkey",
            "p_brand",
            "l_suppkey",
            F.round("_minp", 2).alias("min_price"),
        )
        .distinct()
    )


_CHEAPEST_SQL = """
WITH j AS (
  SELECT p_partkey, p_brand, l_suppkey, l_extendedprice,
         min(l_extendedprice) OVER (PARTITION BY p_partkey) AS minp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size > 45
)
SELECT DISTINCT p_partkey, p_brand, l_suppkey,
       round(minp, 2) AS min_price
FROM j WHERE l_extendedprice = minp
"""


# fixed-point cents quantization shared by the Q11/Q14/Q15 shapes:
# floor(x * 100 + 0.5) over an identical left-assoc double expression
# is bit-deterministic cross-engine, and everything downstream is
# exact integer arithmetic — thresholds, maxima, and shares cannot
# flip on parallel-summation ulps the way raw double sums can.
def _cents(expr):
    return F.floor(expr * 100 + F.lit(0.5).cast("double")).cast("long")


def _important_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group totals kept only above a GLOBAL-total
    fraction — the scalar-subquery threshold decorrelated into one
    broadcast scalar. Exact integer arithmetic end to end: revenue is
    summed in quantized cents and the 4%% threshold is the integer
    predicate 25·nation > global, so no double comparison can flip a
    boundary nation between engines."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    per_nation = (
        orders.withColumn("_cents", _cents(F.col("o_totalprice")))
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(F.sum("_cents").alias("_rev_cents"))
    )
    total = per_nation.agg(F.sum("_rev_cents").alias("_total_cents"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("_rev_cents") * 25 > F.col("_total_cents"))
        .select(
            "n_name",
            F.round(
                F.col("_rev_cents") / F.lit(100).cast("double"), 2
            ).alias("revenue"),
            F.round(
                F.col("_rev_cents") * F.lit(100).cast("double")
                / F.col("_total_cents"),
                4,
            ).alias("share_pct"),
        )
    )


_IMPORTANT_NATION_SQL = """
WITH per_nation AS (
  SELECT n_name,
         CAST(sum(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
),
t AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents FROM per_nation)
SELECT n_name,
       round(rev_cents / CAST(100 AS DOUBLE), 2) AS revenue,
       round(rev_cents * CAST(100 AS DOUBLE) / total_cents, 4) AS share_pct
FROM per_nation, t
WHERE rev_cents * 25 > total_cents
"""


def _top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: max-of-aggregate selection — the supplier(s)
    whose quarterly discounted revenue EQUALS the maximum, with the
    max decorrelated into one broadcast scalar. Revenue is quantized
    line-by-line to integer cents, so the equality that picks the
    winner is exact integer equality, never a double comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .withColumn(
            "_cents",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("_cents").alias("_rev_cents"))
    )
    top = rev.agg(F.max("_rev_cents").alias("_max_cents"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("_rev_cents") == F.col("_max_cents"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            rev.l_suppkey == supplier.s_suppkey,
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            F.round(
                F.col("_rev_cents") / F.lit(100).cast("double"), 2
            ).alias("total_revenue"),
        )
    )


_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                             + CAST(0.5 AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
),
m AS (SELECT max(rev_cents) AS max_cents FROM rev)
SELECT l_suppkey AS suppkey, s_name,
       round(rev_cents / CAST(100 AS DOUBLE), 2) AS total_revenue
FROM rev, m
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_cents = max_cents
"""


def _promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio per month — the share
    of discounted revenue from PROMO-type parts, lineitem joined to
    the broadcast part dim. Numerator and denominator are integer
    cents; only the final share is one fixed double division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li.l_partkey == part.p_partkey,
    ).withColumn(
        "_cents",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
    )
    return (
        j.groupBy(
            # formatted in-engine (UTC-pinned) so the value is
            # probe-TZ-proof — raw timestamps render through the
            # collecting process TZ
            F.date_format(
                F.date_trunc("month", "l_shipdate"), "yyyy-MM"
            ).alias("month")
        )
        .agg(
            F.sum(
                F.when(
                    F.col("p_type").startswith("PROMO"), F.col("_cents")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("_promo_cents"),
            F.sum("_cents").alias("_total_cents"),
        )
        .select(
            "month",
            F.round(
                F.col("_promo_cents") / F.lit(100).cast("double"), 2
            ).alias("promo_revenue"),
            F.round(
                F.col("_promo_cents") * F.lit(100).cast("double")
                / F.col("_total_cents"),
                4,
            ).alias("promo_share_pct"),
        )
    )


_PROMO_SHARE_SQL = """
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
       round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  ELSE 0 END) AS BIGINT) / CAST(100 AS DOUBLE), 2)
         AS promo_revenue,
       round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  ELSE 0 END) AS BIGINT) * CAST(100 AS DOUBLE)
             / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT))
                    AS BIGINT), 4) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def _idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with an above-(global positive)-
    average balance and NO ORDER since 2000 (lapsed), rolled up by
    nation — the scalar AVG subquery decorrelated into ONE broadcast
    (total, count) pair and the NOT EXISTS into a left-anti join
    against the distinct recent-order customer keys. The
    above-average predicate is the exact integer form
    bal_cents · n_pos > total_pos_cents, so no cross-engine float
    division can flip a boundary customer; the positivity filter is
    bal_cents > 0 (same integer both engines).

    Scale shape: customer scans once; the scalar aggregate broadcasts
    two longs; the anti-join probe side is the distinct o_custkey set
    of the pushed-down date slice (shrinks in the map-side combine),
    never raw orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    cust = customer.withColumn("_bal_cents", _cents(F.col("c_acctbal")))
    pos = (
        cust.filter(F.col("_bal_cents") > 0)
        .agg(
            F.sum("_bal_cents").alias("_tot_pos"),
            F.count("*").alias("_n_pos"),
        )
    )
    idle = (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("_bal_cents") * F.col("_n_pos") > F.col("_tot_pos"))
        .join(
            orders.select("o_custkey").distinct(),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(
            F.sum("_bal_cents") / F.lit(100).cast("double"), 2
        ).alias("total_acctbal"),
    )


_Q22_SQL = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS bal_cents
  FROM customer
),
pos AS (
  SELECT CAST(sum(bal_cents) AS BIGINT) AS tot_pos,
         count(*)::BIGINT AS n_pos
  FROM c WHERE bal_cents > 0
)
SELECT c_nationkey, count(*)::BIGINT AS numcust,
       round(CAST(sum(bal_cents) AS BIGINT) / CAST(100 AS DOUBLE), 2)
         AS total_acctbal
FROM c, pos
WHERE bal_cents * n_pos > tot_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""


def _dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested IN-subquery over a correlated
    line-level aggregate ("suppliers whose 1995 shipments of a small
    part exceed HALF that part's total 1995 shipments") decorrelated
    into one (part, supplier) aggregate plus one window total per
    part — raw lineitem shuffles exactly ONCE (into the aggregate);
    the window's partkey-only exchange moves the already-reduced
    (part, supplier) frame, bounded by parts x suppliers-per-part,
    never by line count. The dominance
    predicate is exact integer millis (2·ps_qty > part_qty); the
    part-size filter rides a broadcast dim join; supplier names
    attach to the (tiny) qualifying set only, never to raw lineitem.

    Reference analogue: the severity-aggregation-then-selection
    pattern of app.py's per-user anomaly thresholds, lifted to the
    two-level relational form."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supplier = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    qty_m = F.floor(F.col("l_quantity") * 1000).cast("long")
    ps = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_m).alias("ps_qty_millis"))
    )
    w = Window.partitionBy("l_partkey")
    dom = ps.withColumn(
        "part_qty_millis", F.sum("ps_qty_millis").over(w)
    ).filter(F.col("ps_qty_millis") * 2 > F.col("part_qty_millis"))
    return (
        dom.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_parts_dominated"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            "n_parts_dominated",
        )
    )


_Q20_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(floor(l_quantity * 1000) AS BIGINT)) AS BIGINT)
           AS ps_qty_millis
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 10
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, l_suppkey, ps_qty_millis,
         CAST(sum(ps_qty_millis) OVER (PARTITION BY l_partkey) AS BIGINT)
           AS part_qty_millis
  FROM ps
)
SELECT l_suppkey AS suppkey, s_name,
       count(*)::BIGINT AS n_parts_dominated
FROM tot JOIN supplier ON l_suppkey = s_suppkey
WHERE ps_qty_millis * 2 > part_qty_millis
GROUP BY l_suppkey, s_name
"""


def _priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact×fact join + per-group CONDITIONAL counts
    — lines shipped in 1997 classified by their order's priority
    (urgent/high vs other), counted per return flag. The priority
    class is computed map-side after one broadcast-unfriendly join;
    orders carries only (key, priority) into it, so the shuffled
    payload is two columns, and both counts come from ONE aggregate
    pass (the severity-histogram discipline, A9, on a join)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


def _supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: per part attribute group, the DISTINCT count
    of suppliers, EXCLUDING a subquery-defined blocklist (negative-
    balance suppliers standing in for the complaint scan) — NOT IN
    as a broadcast anti-join BEFORE the distinct aggregate, so
    excluded suppliers never enter the count. Supply relationships
    derive from shipped lines (the testdata has no partsupp); the
    (part, supplier) projection reduces in a map-side distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    rel = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return (
        rel.groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size <= 20
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


def _disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate spanning BOTH join
    sides (brand/size from the dim, quantity from the fact) — the
    plan-shape test for disjunctive pushdown: Catalyst must push the
    dim-only disjuncts to the part scan and the fact-only bounds to
    the lineitem scan (qty ∈ [1, 36] covers all three arms) while
    the full disjunction evaluates post-join. Revenue in exact
    integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == part.p_partkey,
    )
    qty = F.col("l_quantity")
    arm = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b)
        & (F.col("p_size") <= smax)
        & (qty >= qlo)
        & (qty <= qhi)
    )
    picked = j.filter(
        arm("Brand#12", 5, 1, 11)
        | arm("Brand#23", 10, 10, 20)
        | arm("Brand#34", 15, 20, 36)
    )
    return picked.agg(
        F.count("*").alias("n_lines"),
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_cents"),
    )


_Q19_SQL = """
SELECT count(*)::BIGINT AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size <= 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size <= 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size <= 15
       AND l_quantity >= 20 AND l_quantity <= 36)
"""


def _shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem
    with date predicates on BOTH fact sides, revenue per order, top-10
    unshipped orders.  customer broadcasts; orders⋈lineitem is the one
    fact×fact exchange; the final top-k is TakeOrdered over the exact
    integer-cents revenue with an orderkey tie-break (total order, no
    global sort)."""
    cutoff = F.lit("1998-07-01").cast("timestamp")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        li.join(
            orders.join(
                F.broadcast(customer.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_orderpriority",
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS odate,
       o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l_orderkey, odate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


def _forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical single-scan filtered aggregate —
    zero joins, predicates (date band, discount band, quantity cap)
    all pushed to the parquet scan, one global sum.  The shape every
    pushdown audit starts from."""
    li = load_table(spark, sf_dir, "lineitem")
    picked = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return picked.agg(
        F.count("*").alias("n_lines"),
        F.sum(
            _cents(F.col("l_extendedprice") * F.col("l_discount"))
        ).alias("forecast_cents"),
    )


_Q6_SQL = """
SELECT count(*)::BIGINT AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * l_discount * 100
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         AS forecast_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def _volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume — the
    OR-of-symmetric-pairs predicate across two independent dim chains
    (supplier→nation, customer→nation) with a shipping-year rollup.
    Both nation chains broadcast; lineitem joins orders on the fact
    key once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "cust_nation"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev) AS BIGINT) AS revenue_cents
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def _market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue in a
    part-type market, per order year — the conditional-sum ratio over
    a six-table star.  Every dim chain broadcasts; the share divides
    two exact integer-cents sums once (one double division per output
    row, cross-engine deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("nation_cents"),
            F.sum(rev).alias("total_cents"),
        )
        .select(
            "o_year", "nation_cents", "total_cents",
            F.round(
                F.col("nation_cents") / F.col("total_cents"), 6
            ).alias("mkt_share"),
        )
    )


_Q8_SQL = """
SELECT o_year, nation_cents, total_cents,
       round(nation_cents * 1.0 / total_cents, 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN rev ELSE 0 END)
              AS BIGINT) AS nation_cents,
         CAST(sum(rev) AS BIGINT) AS total_cents
  FROM (
    SELECT l_orderkey, l_suppkey,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'ECONOMY'
  ) l
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY o_year
)
"""


def _product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-(nation, year) profit over a part-name
    LIKE filter across the full join tree — adapted to this schema's
    tables (no partsupp: unit cost is the part's retail price, the
    same fact×dims plan shape and profit-expression arithmetic).
    Profit stays exact: two cents quantizations subtracted as
    integers."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - _cents(F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_cents"))
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)
                - CAST(floor(p_retailprice * l_quantity * 100
                             + CAST(0.5 AS DOUBLE)) AS BIGINT))
            AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def _returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    in a quarter — returnflag-filtered fact×fact join, customer/nation
    dims broadcast, exact-cents ranking with a custkey tie-break
    (TakeOrdered, no global sort)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), F.asc("custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey AS custkey, c_name,
       round(c_acctbal, 2) AS acctbal,
       n_name AS nation,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_cents DESC, custkey ASC
LIMIT 20
"""


def _local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape PROPER: per-nation revenue where the supplier
    and the customer share a nation (the n1 = n2 equality constraint
    that distinguishes Q5 from a plain star rollup — revenue_by_nation
    covers that simpler shape).  Region + order-year filters; both
    nation chains broadcast; the equality evaluates post-join on the
    two broadcast-provided nation keys, never as an extra exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nations = (
        nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey",
            F.col("n_nationkey").alias("s_nkey"),
            F.col("n_name").alias("nation"),
        )
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_nationkey").alias("c_nkey"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nkey")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("s_nkey") == F.col("c_nkey"))
        .groupBy("nation")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents"),
            F.count("*").alias("n_lines"),
        )
    )


_Q5_SQL = """
SELECT n1.n_name AS nation,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*)::BIGINT AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
WHERE r1.r_name = 'EUROPE' AND r2.r_name = 'EUROPE'
  AND n1.n_nationkey = n2.n_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


def _customer_revenue_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function battery: rank / dense_rank / percent_rank /
    cume_dist / ntile(4) over per-nation customer revenue in ONE
    window pass (one shuffle on the partition key, every function
    riding the same sort). Revenue in exact integer cents and a
    custkey tie-break give a total order, so the rank family —
    including ntile's remainder allocation — is engine-deterministic;
    percent_rank/cume_dist are single exact-integer divisions."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        orders.withColumn("_cents", _cents(F.col("o_totalprice")))
        .groupBy("o_custkey")
        .agg(F.sum("_cents").alias("rev_cents"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("rev_cents"), F.asc("c_custkey")
    )
    return rev.select(
        "c_nationkey",
        F.col("c_custkey").alias("custkey"),
        "rev_cents",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


_RANKS_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY o_custkey
)
SELECT c_nationkey, c_custkey AS custkey, rev_cents,
       CAST(rank() OVER w AS INTEGER) AS rnk,
       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM rev JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY rev_cents DESC, c_custkey ASC)
"""


QUERIES: dict[str, QuerySpec] = {
    "shipping_priority": QuerySpec(
        _shipping_priority, _Q3_SQL,
        "TPC-H Q3 shape: segment + two-sided date filters, per-order "
        "revenue, top-10 by exact cents (TakeOrdered)",
    ),
    "forecast_revenue": QuerySpec(
        _forecast_revenue, _Q6_SQL,
        "TPC-H Q6 shape: single-scan filtered aggregate, all "
        "predicates pushed to the parquet scan",
    ),
    "volume_shipping": QuerySpec(
        _volume_shipping, _Q7_SQL,
        "TPC-H Q7 shape: bidirectional two-nation trade volume per "
        "shipping year — symmetric-pair predicate over two broadcast "
        "dim chains",
    ),
    "market_share": QuerySpec(
        _market_share, _Q8_SQL,
        "TPC-H Q8 shape: one nation's revenue share of a region's "
        "part-type market per year — conditional-sum ratio over a "
        "six-table star, exact-cents numerator/denominator",
    ),
    "product_profit": QuerySpec(
        _product_profit, _Q9_SQL,
        "TPC-H Q9 shape: per-(nation, year) profit under a part-name "
        "LIKE filter — integer-exact profit expression over the full "
        "join tree",
    ),
    "local_supplier_revenue": QuerySpec(
        _local_supplier_revenue, _Q5_SQL,
        "TPC-H Q5 shape proper: per-nation revenue under the "
        "supplier-nation = customer-nation equality — region + year "
        "filters, both nation chains broadcast",
    ),
    "returned_item_customers": QuerySpec(
        _returned_item_customers, _Q10_SQL,
        "TPC-H Q10 shape: top-20 customers by returned-item revenue "
        "in a quarter — returnflag fact filter, broadcast dims, "
        "exact-cents TakeOrdered",
    ),
    "customer_revenue_ranks": QuerySpec(
        _customer_revenue_ranks, _RANKS_SQL,
        "analytic battery: rank/dense_rank/percent_rank/cume_dist/"
        "ntile in one window pass — total order via integer cents + "
        "key tie-break makes every rank engine-deterministic",
    ),
    "priority_line_counts": QuerySpec(
        _priority_line_counts, _Q12_SQL,
        "Q12 shape: fact×fact join + one-pass conditional counts per "
        "group — two-column shuffled payload",
    ),
    "supplier_part_counts": QuerySpec(
        _supplier_part_counts, _Q16_SQL,
        "Q16 shape: NOT-IN blocklist as broadcast anti-join before a "
        "grouped count-distinct over derived supply relationships",
    ),
    "disjunctive_brand_revenue": QuerySpec(
        _disjunctive_brand_revenue, _Q19_SQL,
        "Q19 shape: OR-of-ANDs predicate across both join sides — "
        "disjunctive pushdown, integer-cents revenue",
    ),
    "idle_rich_customers": QuerySpec(
        _idle_rich_customers, _Q22_SQL,
        "Q22 shape: above-global-average balance + NOT EXISTS orders "
        "as broadcast scalar + anti-join, integer-cents predicate",
    ),
    "dominant_part_suppliers": QuerySpec(
        _dominant_part_suppliers, _Q20_SQL,
        "Q20 shape: nested line-level aggregate IN-subquery as one "
        "two-level aggregate sharing a single shuffle, integer-millis "
        "dominance predicate",
    ),
    "cheapest_supplier_per_part": QuerySpec(
        _cheapest_supplier_per_part, _CHEAPEST_SQL,
        "Q2 shape: argmin-per-group decorrelation — per-part minimum "
        "price suppliers via one window min, exact element equality",
    ),
    "important_nation_revenue": QuerySpec(
        _important_nation_revenue, _IMPORTANT_NATION_SQL,
        "Q11 shape: group totals above a global-total fraction — "
        "broadcast scalar threshold, exact integer-cents arithmetic",
    ),
    "top_revenue_supplier": QuerySpec(
        _top_revenue_supplier, _TOP_SUPPLIER_SQL,
        "Q15 shape: max-of-aggregate selection in integer cents — "
        "broadcast max scalar, exact winner equality",
    ),
    "promo_revenue_share": QuerySpec(
        _promo_revenue_share, _PROMO_SHARE_SQL,
        "Q14 shape: monthly conditional-sum revenue share over the "
        "broadcast part dim — integer-cents ratio, one fixed division",
    ),
    "revenue_rollup": QuerySpec(
        _revenue_rollup, _ROLLUP_SQL,
        "ROLLUP subtotals over region/nation (grouping-sets extension)",
    ),
    "customers_without_orders": QuerySpec(
        _customers_without_orders, _ANTI_SQL,
        "left-anti join (NOT EXISTS)",
    ),
    "customer_order_distribution": QuerySpec(
        _customer_order_distribution, _Q13_SQL,
        "TPC-H Q13 shape: outer-join order-count distribution incl. "
        "zero-order customers, two map-side-combined levels",
    ),
    "large_volume_customers": QuerySpec(
        _large_volume_customers, _Q18_SQL,
        "TPC-H Q18 shape: aggregate-then-semi decorrelation — "
        "HAVING reduces lineitem to qualifying keys before any join; "
        "integer-millis threshold",
    ),
    "small_quantity_revenue": QuerySpec(
        _small_quantity_revenue, _Q17_SQL,
        "TPC-H Q17 shape: correlated avg subquery decorrelated to a "
        "per-part aggregate join; qty < 0.2*avg as exact integer "
        "algebra (5*qty*cnt < sum)",
    ),
    "sole_returning_suppliers": QuerySpec(
        _sole_returning_suppliers, _Q21_SQL,
        "TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation as "
        "ONE per-order aggregate joined back — no quadruple "
        "self-join",
    ),
    "status_priority_pivot": QuerySpec(
        _status_priority_pivot, _PIVOT_SQL,
        "pivot on fixed domain (generalized severity histogram)",
    ),
    "pricing_summary": QuerySpec(
        _pricing_summary, _PRICING_SQL,
        "TPC-H Q1: scan→filter→6-group hash aggregate",
    ),
    "revenue_by_nation": QuerySpec(
        _revenue_by_nation, _REVENUE_SQL,
        "star join with broadcast dims, group by nation",
    ),
    "top_customers": QuerySpec(
        _top_customers, _TOP_CUSTOMERS_SQL,
        "aggregate + top-k (TakeOrderedAndProject)",
    ),
    "order_priority_counts": QuerySpec(
        _order_priority_counts, _ORDER_PRIORITY_SQL,
        "left-semi join + aggregate (TPC-H Q4 shape)",
    ),
    "events_enriched_latest": QuerySpec(
        _events_enriched_latest, _EVENTS_ENRICHED_SQL,
        "J1 fact×dim broadcast left join + latest-50 top-k",
    ),
}
