"""Windowed streaming aggregation.

The reference implements tumbling windows by hand (reference:
managers/window.py:20 + adrs/002): the handler upserts per-bucket
partials into a DuckDB table (INSERT ... ON CONFLICT DO UPDATE), a
manager thread polls for buckets older than now()-interval, emits them
to a sink and deletes them.

Structured Streaming has this machinery natively and *correctly* for
distributed state: ``groupBy(window(ts, d))`` keeps partial aggregates
in the state store (the managed table), the watermark decides when a
window is closed (the poll + delete), and append output mode emits each
window exactly once when it closes (the collect + publish). Late data
within the watermark updates the right window instead of being wrongly
bucketed — a correctness upgrade over wall-clock polling.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def tumbling_aggregate(
    stream: DataFrame,
    time_column: str,
    duration: str,
    aggs: list[Column] | None = None,
    group_by: list[str] | None = None,
    watermark_delay: str | None = "0 seconds",
) -> DataFrame:
    """Watermarked tumbling-window aggregation. Emits
    (window_start, window_end, *group_by, *aggs). Append-mode ready:
    rows appear only when the watermark passes window end.

    ``watermark_delay=None`` means the watermark is already defined
    upstream (e.g. by a dedupe stage — Spark disallows redefining it
    below another stateful operator); the window inherits it."""
    aggs = aggs or [F.count("*").alias("n")]
    if watermark_delay is not None:
        stream = stream.withWatermark(time_column, watermark_delay)
    out = stream.groupBy(
        F.window(time_column, duration).alias("w"), *(group_by or [])
    ).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_aggregate(
    stream: DataFrame,
    time_column: str,
    duration: str,
    slide: str,
    aggs: list[Column] | None = None,
    group_by: list[str] | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Hopping-window variant (each row lands in duration/slide
    windows)."""
    aggs = aggs or [F.count("*").alias("n")]
    out = (
        stream.withWatermark(time_column, watermark_delay)
        .groupBy(F.window(time_column, duration, slide).alias("w"), *(group_by or []))
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_aggregate(
    stream: DataFrame,
    time_column: str,
    gap: str,
    aggs: list[Column] | None = None,
    group_by: list[str] | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Session windows (dynamic length, closed after `gap` of
    inactivity) — the streaming twin of the batch gaps-and-islands
    operator (operators/analytics.py events_sessionize)."""
    aggs = aggs or [F.count("*").alias("n")]
    out = (
        stream.withWatermark(time_column, watermark_delay)
        .groupBy(F.session_window(time_column, gap).alias("w"), *(group_by or []))
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


class TumblingWindow:
    """Drop-in equivalent of the reference's managed-table Tumbling
    manager: wire a stream through a tumbling agg into a sink callback.

    sink_fn receives each batch of CLOSED windows (what the reference's
    collect_closed_windows_sql returned on poll)."""

    def __init__(
        self,
        stream: DataFrame,
        time_column: str,
        duration: str,
        aggs: list[Column] | None = None,
        group_by: list[str] | None = None,
        watermark_delay: str = "0 seconds",
        sink_fn: Callable[[DataFrame, int], None] | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.result = tumbling_aggregate(
            stream, time_column, duration, aggs, group_by, watermark_delay
        )
        self.sink_fn = sink_fn or (lambda df, bid: None)
        self.checkpoint_dir = checkpoint_dir
        self._query: StreamingQuery | None = None

    def start(self, trigger_once: bool = True, **trigger_kwargs) -> StreamingQuery:
        writer = (
            self.result.writeStream.outputMode("append").foreachBatch(self.sink_fn)
        )
        if self.checkpoint_dir:
            writer = writer.option("checkpointLocation", self.checkpoint_dir)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        elif trigger_kwargs:
            writer = writer.trigger(**trigger_kwargs)
        self._query = writer.start()
        return self._query

    def stop(self):
        if self._query:
            self._query.stop()
