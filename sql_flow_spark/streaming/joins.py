"""Streaming joins — the reference's stream-enrichment surface
(reference: dev/config/examples/csv.mem.join.yml joins each batch
against a static view; kafka.postgres.join.yml against postgres).

- stream_static_join: every micro-batch joins a (broadcastable) static
  dimension. The dim is re-resolvable per batch, so slowly-changing
  dims refresh naturally on re-read.
- stream_stream_join: watermarked interval join between two streams —
  what the reference cannot express at all (its joins are batch-vs-
  static); state for both sides is bounded by the watermark + time
  bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    on: Column | str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a static dimension; dim is broadcast so the
    stream side never shuffles for the join."""
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    watermark_delay: str = "10 minutes",
    max_lag: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: right events join left events
    with the matching key whose timestamps fall within [left_time,
    left_time + max_lag]. Both state stores are purged past the
    watermark + time bound, so state is bounded at any input rate."""
    lw = left.withWatermark(left_time, watermark_delay)
    rw = right.withWatermark(right_time, watermark_delay)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_time] >= lw[left_time])
        & (rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond, how)


def stream_scd_lookup(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    event_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Point-in-time-correct enrichment against a slowly-changing
    (SCD type-2) dimension: each stream row joins the dim version
    whose validity interval contains its EVENT time — never the
    current version, so late/replayed events are enriched with the
    facts as of when they happened (no temporal leakage). An open
    current version is expressed with ``valid_to`` NULL.

    The versioned dim is broadcast (dims are small relative to the
    stream — same posture as stream_static_join), so the stream side
    never shuffles and the interval predicate is evaluated against the
    hash-relation rows per batch. The batch-side twin of this
    semantics is operators/analytics.orders_enrich_scd; the as-of
    variant (latest version at-or-before, intervals implicit) is
    operators/asof.asof_join."""
    right = F.broadcast(dim) if broadcast_dim else dim
    cond = (
        (stream[key] == right[dim_key])
        & (stream[event_time] >= right[valid_from])
        & (
            right[valid_to].isNull()
            | (stream[event_time] < right[valid_to])
        )
    )
    return stream.join(right, cond, "left")
