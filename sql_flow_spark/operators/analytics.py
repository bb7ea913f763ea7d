"""Analytical query coverage (TPC-H-style) — proves the SQL surface the
reference exposes through DuckDB (aggregation, multi-way joins, window
functions, pivots) as scale-ready Spark plans.

Determinism contract (see registry.py): double products use the same
expression tree both engines, sums pass through DECIMAL, top-k orders
carry total tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_flow_spark.registry import (
    O_TS_STR,
    davg,
    dsum,
    o_davg,
    o_dsum,
    query,
    ts_str,
)
from sql_flow_spark.tables import load_tables

# l_extendedprice * (1 - l_discount), computed in DOUBLE with a fixed
# expression tree, summed exactly via DECIMAL.
_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {o_dsum('l_quantity')} AS sum_qty,
      {o_dsum('l_extendedprice')} AS sum_base_price,
      {o_dsum(_REVENUE)} AS sum_disc_price,
      {o_dsum(f'({_REVENUE}) * (1 + l_tax)')} AS sum_charge,
      {o_davg('l_quantity')} AS avg_qty,
      {o_davg('l_extendedprice')} AS avg_price,
      {o_davg('l_discount', 6)} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the flagship wide aggregation. One
    shuffle on a 6-value key after map-side partial agg; the shipdate
    predicate is pushed to the parquet scan."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    rev = _revenue_col()
    charge = rev * (F.lit(1) + F.col("l_tax"))
    return (
        t["lineitem"]
        .where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(rev).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      o_orderkey,
      {O_TS_STR.format(expr='o_orderdate')} AS o_orderdate_s,
      o_orderpriority,
      {o_dsum(_REVENUE)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective 3-way join + agg + top-k. customer is the
    small side after the segment filter -> broadcast it into orders;
    the orders->lineitem join shuffles on orderkey only after both
    date predicates are pushed down. Top-k has a total order."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-07-01 00:00:00").cast("timestamp")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_revenue_col()).alias("revenue"))
        .select(
            "o_orderkey",
            ts_str("o_orderdate").alias("o_orderdate_s"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle=f"""
    SELECT
      n_name,
      {o_dsum(_REVENUE)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join. region/nation/supplier broadcast (fixed or
    sublinear size); the only big shuffle is orders<->lineitem on
    orderkey. Catalyst prunes every unused column at the scans."""
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    nr = (
        t["nation"]
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        t["customer"].select("c_custkey", "c_nationkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(_revenue_col()).alias("revenue"))
    )


@query(
    "top_n_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    )
    WHERE rnk <= 3
    """,
)
def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-N per group. Single shuffle on the partition
    key; at scale this is the pattern to prefer over per-group
    collect/sort. Total tiebreak (acctbal, custkey)."""
    t = load_tables(spark, sf_dir, ("customer",))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        t["customer"]
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rnk")
    )


@query(
    "events_sessionize",
    oracle="""
    SELECT
      user_id,
      COUNT(*) AS n_events,
      CAST(SUM(is_new) AS BIGINT) AS n_sessions
    FROM (
      SELECT
        user_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-minute inactivity gap): the
    classic event-stream operator the reference expresses over managed
    tables. lag + conditional sum; one shuffle on user_id serving both
    the window and the aggregation. The gap compares at MICROSECOND
    precision on both engines — a whole-second cast would truncate and
    classify gaps in (1800, 1801) s differently from the oracle."""
    t = load_tables(spark, sf_dir, ("events",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        t["events"]
        .select("user_id", "ts", "event_id")
        .withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_new").cast("long").alias("n_sessions"),
        )
    )


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "events_pivot",
    oracle=f"""
    SELECT
      user_id,
      {', '.join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)},
      {o_dsum('value')} AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (explicit value set, so the
    plan is a single HashAggregate — no second pass to discover pivot
    values, which matters when the fact table is 100 TB)."""
    t = load_tables(spark, sf_dir, ("events",))
    aggs = [
        F.sum(F.when(F.col("event_type") == et, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{et}")
        for et in _EVENT_TYPES
    ]
    aggs.append(dsum("value").alias("total_value"))
    return t["events"].groupBy("user_id").agg(*aggs)


@query(
    "orders_enrich_scd",
    oracle="""
    SELECT
      o_orderkey,
      COALESCE(c_name, 'UNKNOWN') AS customer_name,
      CASE o_orderstatus
        WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished' ELSE 'partial'
      END AS status_label,
      CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_rank,
      o_totalprice
    FROM orders
    LEFT JOIN customer ON o_custkey = c_custkey
    """,
)
def orders_enrich_scd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-join enrichment with null handling + CASE mapping — the
    reference's enrich.yml / postgres-join pattern against a keyed
    dimension. Dimension side broadcast."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .select(
            "o_orderkey",
            F.coalesce("c_name", F.lit("UNKNOWN")).alias("customer_name"),
            F.when(F.col("o_orderstatus") == "O", "open")
            .when(F.col("o_orderstatus") == "F", "finished")
            .otherwise("partial")
            .alias("status_label"),
            F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_rank"),
            "o_totalprice",
        )
    )
