"""Core query semantics of the reference's example pipelines, Spark-first.

Each builder mirrors one reference example config (cited per-function)
but is expressed against the driver testdata tables. All are pure
DataFrame-API plans -> Catalyst handles pushdown/pruning; joins against
fixed-size dims are broadcast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_flow_spark.functions.url import oracle_parse_domain, parse_domain
from sql_flow_spark.registry import (
    O_TS_STR,
    dsum,
    o_dsum,
    query,
    ts_str,
)
from sql_flow_spark.tables import load_tables


@query(
    "basic_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS event_count
    FROM events GROUP BY event_type
    """,
)
def basic_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch GROUP BY count (reference:
    dev/config/examples/basic.agg.mem.yml — city/count over batch).
    Map-side partial aggregation -> single shuffle on the group key."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].groupBy("event_type").agg(F.count("*").alias("event_count"))


@query(
    "enrich",
    oracle="""
    SELECT
      event_id,
      event_type,
      upper(event_type) AS event_type_upper,
      CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
      'enriched' AS tag
    FROM events
    """,
)
def enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed-column enrichment incl. JSON extraction
    (reference: dev/config/examples/enrich.yml adds nested/literal
    columns to every row). Narrow transform: zero shuffles."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"]
    return e.select(
        "event_id",
        "event_type",
        F.upper("event_type").alias("event_type_upper"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.lit("enriched").alias("tag"),
    )


@query(
    "filter_transform",
    oracle=f"""
    SELECT
      event_id,
      user_id,
      {O_TS_STR.format(expr='ts')} AS ts_s,
      value,
      value * 2 AS value_x2
    FROM events
    WHERE event_type = 'purchase' AND value > 50
    """,
)
def filter_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + transform (reference: dev/config/examples/kafka.dlq.yml
    style cleanup pipelines). Predicates reach the parquet scan as
    PushedFilters; value*2 is exact in binary so engines agree."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"]
    return e.where((F.col("event_type") == "purchase") & (F.col("value") > 50)).select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts_s"),
        "value",
        (F.col("value") * 2).alias("value_x2"),
    )


@query(
    "dim_join",
    oracle=f"""
    SELECT
      r_name,
      n_name,
      COUNT(*) AS n_customers,
      {o_dsum('c_acctbal')} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream x static-dim join (reference:
    dev/config/examples/csv.mem.join.yml joins batch against a CSV
    view). nation/region are fixed-size -> broadcast: the fact side
    never shuffles for the join, only for the final aggregation."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "region"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "tumbling_window",
    oracle=f"""
    SELECT
      {O_TS_STR.format(expr="date_trunc('hour', ts)")} AS bucket,
      event_type,
      COUNT(*) AS n_events,
      {o_dsum('value')} AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (reference:
    dev/config/examples/tumbling.window.yml + managers/window.py:20 —
    hourly buckets upserted then emitted on close; its
    collect_closed_windows_sql strftime's the bucket exactly like this).
    Batch twin of streaming/window.py's watermarked version."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("_bucket"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            ts_str("_bucket").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window",
    oracle=f"""
    SELECT
      {O_TS_STR.format(expr='ws')} AS window_start,
      COUNT(*) AS n_events,
      {o_dsum('value')} AS total_value
    FROM (
      SELECT
        unnest([
          time_bucket(INTERVAL '30 minutes', ts),
          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
        ]) AS ws,
        value
      FROM events
    )
    GROUP BY ws
    """,
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window (1h window, 30m slide) — generalization of the
    reference's tumbling manager (adrs/002). Spark's window() assigns
    each row to both overlapping windows natively; the oracle unrolls
    the same epoch-aligned assignment."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


_URL_EXPR_DUCK = (
    "CASE WHEN doc_id % 2 = 0 "
    "THEN 'https://www.' || source || '.co.uk/a/' || doc_id "
    "ELSE 'http://blog.' || source || '.com/b?q=' || doc_id END"
)


@query(
    "udf_parse_domain",
    oracle=f"""
    SELECT domain, COUNT(*) AS n_docs
    FROM (
      SELECT {oracle_parse_domain(_URL_EXPR_DUCK)} AS domain
      FROM documents
    )
    GROUP BY domain
    """,
)
def udf_parse_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_domain UDF surface (reference: sqlflow/udf/url.py:6 +
    dev/config/examples/udf.yml). Implemented as JVM regexp expressions
    (codegen) instead of a per-row python UDF — same semantics, ~100x
    cheaper at scale; synthesizes URLs from the documents table."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"]
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("https://www."), "source", F.lit(".co.uk/a/"), "doc_id"),
    ).otherwise(
        F.concat(F.lit("http://blog."), "source", F.lit(".com/b?q="), "doc_id")
    )
    return (
        d.select(parse_domain(url).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "latest_by_key",
    oracle=f"""
    SELECT user_id, event_id, event_type, {O_TS_STR.format(expr='ts')} AS ts_s, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key dedup/upsert semantics (reference:
    dev/config/examples/kafka.motherduck.idempotent.yml — idempotent
    sink via dedup). One shuffle on the key; total order via
    (ts, event_id) tiebreak so engines agree on winners."""
    t = load_tables(spark, sf_dir, ("events",))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            ts_str("ts").alias("ts_s"),
            "value",
        )
    )
