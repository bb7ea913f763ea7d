"""SCD type-2 MAINTENANCE without MERGE INTO — the CDC apply step.

The engine already reads SCD2 dims point-in-time-correctly
(operators/analytics.orders_enrich_scd batch-side,
streaming/joins.stream_scd_lookup stream-side); this module WRITES
them: given the current dimension and a batch of changes, emit the
updated SCD2 table with old versions closed and new versions opened.

MERGE INTO needs a lakehouse table format; on plain parquet the same
result is an anti-join-free union + one window per key — closed
history passes through untouched (immutable), and the open version
plus the new changes re-chain their validity intervals via
lead(valid_from). One shuffle on the key, no row-by-row upserts —
the CDC-apply shape that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sql_flow_spark.registry import query
from sql_flow_spark.tables import load_tables


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension.

    ``dim`` columns: key_cols + attr_cols + valid_from + valid_to
    (NULL = open current version). ``changes`` columns: key_cols +
    attr_cols + ``ts_col`` (the change instant, becomes valid_from).

    Contract: change timestamps are >= the open version's valid_from
    (late-arriving changes older than the open version require a
    history rebuild — same restriction MERGE-based SCD2 has).
    Multiple changes per key in one batch chain correctly. Ties on the
    timestamp are ordered by ``tiebreak_cols`` (give one for
    determinism when ties are possible).

    Plan shape: closed history is a pass-through union (never
    shuffled); the open versions + changes shuffle ONCE on the key for
    the lead() window."""
    closed = dim.where(F.col("valid_to").isNotNull())
    open_v = dim.where(F.col("valid_to").isNull()).select(
        *key_cols, *attr_cols, "valid_from"
    )
    cand = open_v.unionByName(
        changes.select(
            *key_cols, *attr_cols, F.col(ts_col).alias("valid_from")
        ),
        allowMissingColumns=False,
    )
    order = [F.col("valid_from")] + [
        F.col(c) for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    rechained = cand.withColumn(
        "valid_to", F.lead("valid_from").over(w)
    ).select(*key_cols, *attr_cols, "valid_from", "valid_to")
    return closed.select(
        *key_cols, *attr_cols, "valid_from", "valid_to"
    ).unionByName(rechained)


@query(
    "scd2_user_status",
    oracle="""
    SELECT user_id,
           event_type AS status,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS valid_to_us
    FROM events
    """,
)
def scd2_user_status(spark, sf_dir: str) -> DataFrame:
    """SCD2 history built from a change stream: every event is a
    status change for its user, so scd2_apply_changes over an empty
    dimension yields the full versioned history (valid_to NULL = the
    user's current status). The dim-merge path (closing an existing
    open version) is pinned by tests/test_scd.py scenarios; this key
    proves the chaining arithmetic against the oracle's lead()."""
    t = load_tables(spark, sf_dir, ("events",))
    changes = t["events"].select(
        "user_id",
        F.col("event_type").alias("status"),
        F.unix_micros("ts").alias("change_us"),
        "event_id",
    )
    empty_dim = changes.select(
        "user_id",
        "status",
        "event_id",
        F.col("change_us").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    ).limit(0)
    out = scd2_apply_changes(
        empty_dim,
        changes,
        key_cols=["user_id"],
        ts_col="change_us",
        attr_cols=["status", "event_id"],
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "status",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
    )
