"""Stream deduplication — the reference achieves idempotency via
dedup-on-insert in the sink DB (reference:
dev/config/examples/kafka.motherduck.idempotent.yml). Spark-native:
dropDuplicates within the watermark horizon keeps dedup state in the
state store, bounded by event time, with no external DB roundtrip."""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedupe_stream(
    stream: DataFrame,
    keys: list[str],
    time_column: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once per key within the watermark horizon.

    With a time column the state is bounded (keys older than the
    watermark are evicted); without one the state grows unboundedly —
    only acceptable for small key domains."""
    if time_column:
        return stream.withWatermark(time_column, watermark_delay).dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)
