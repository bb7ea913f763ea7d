"""As-of (temporal point-in-time) join — the custom operator Spark's
DataFrame API lacks but time-series analytics need constantly: for
each left row, attach the latest right row with the same key whose
timestamp is at or before the left timestamp.

Spark-first implementation, no Pandas and no per-row Python: tag both
sides, union them, and run one ``last(..., ignorenulls=True)`` window
per key ordered by (ts, side). That is a single shuffle + sort per
key — the same physical shape Flink's temporal join and pandas'
merge_asof use, and it scales to 100 TB because state per key is one
running value, never a buffered range. (A broadcast-right
range-join would be the alternative only when the right side is
dim-sized.)

Reference parity: the reference's SQL surface is DuckDB
(/root/reference/sqlflow/sql.py), where this is the native ASOF JOIN
clause — the oracle below uses exactly that, so the driver proves the
union-window plan implements DuckDB's ASOF semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_flow_spark.registry import query
from sql_flow_spark.tables import load_tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains ``payload_cols``
    from the latest ``right`` row with equal ``keys`` and
    ``right.ts_col <= left.ts_col`` (NULLs when no such row), plus
    ``asof_ts`` = that right row's timestamp.

    Contract: ``right`` must be unique per (keys, ts_col) — collapse
    with max_by first (ties would otherwise be nondeterministic; DuckDB
    ASOF has the same ambiguity). Left columns pass through unchanged.

    Plan shape: one Exchange on ``keys`` + one in-partition sort over
    the unioned sides; the window carries O(1) running state per key.
    """
    # SQL join semantics: NULL keys never match. The union-window
    # would otherwise group null-key rows of both sides into one
    # partition and "match" them; dropping null-key right rows makes a
    # null-key left row see an empty partition -> NULL payload, which
    # is exactly what ASOF LEFT JOIN produces.
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    # Likewise a NULL-ts right row can never satisfy right.ts <= left.ts
    # (DuckDB ASOF agrees). Without this filter it sorts first in the
    # ascending window (nulls first), so last(payload, ignorenulls=True)
    # could attach its payload while last(__rts) skips its NULL ts —
    # a payload/asof_ts mismatch no ASOF semantics would produce.
    right = right.where(F.col(ts_col).isNotNull())
    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__rts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
            for c in payload_cols
        ],
    )
    tagged_right = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in keys and c != ts_col
        ],
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("__rts"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    ).select(*tagged_left.columns)

    # Right rows sort BEFORE left rows at equal ts (__side 0 < 1), so
    # an exactly-simultaneous right row matches — ASOF `>=` semantics.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        *lcols,
        F.col("__side"),
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return filled.where(F.col("__side") == 1).drop("__side")


@query(
    "asof_attribution",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts,
             MAX(event_id) AS click_id,
             arg_max(value, event_id) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT
      p.event_id,
      p.user_id,
      epoch_us(p.ts) AS purchase_ts_us,
      p.value AS purchase_value,
      c.click_id,
      c.click_value,
      epoch_us(p.ts) - epoch_us(c.ts) AS us_since_click
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined as-of to the most
    recent click by the same user at or before the purchase instant —
    the canonical point-in-time-correct join (no lookahead leakage),
    verified against DuckDB's native ASOF LEFT JOIN.

    Scale shape: both sides are filtered scans of the same fact; the
    union-window asof_join shuffles once on user_id and sorts within
    partitions. Skewed users are bounded by the per-key O(1) window
    state; no range buffering, no crossJoin."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"]
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_id"),
            F.max_by("value", "event_id").alias("click_value"),
        )
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        ts_col="ts",
        payload_cols=["click_id", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
        "click_id",
        "click_value",
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias(
            "us_since_click"
        ),
    )
