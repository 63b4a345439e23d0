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


QUERIES: dict[str, QuerySpec] = {
    "revenue_rollup": QuerySpec(
        _revenue_rollup, _ROLLUP_SQL,
        "ROLLUP subtotals over region/nation (grouping-sets extension)",
    ),
    "customers_without_orders": QuerySpec(
        _customers_without_orders, _ANTI_SQL,
        "left-anti join (NOT EXISTS)",
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
