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
