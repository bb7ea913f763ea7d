"""Custom Python DataSource: a replayable spool-directory stream.

This is the Spark 4 Python Data Source API (pyspark.sql.datasource) —
the same engine contract the Kafka connector implements (offsets,
replay between offsets, commit), written in Python and registered at
session level, so the engine treats it as a first-class
``readStream.format(...)``. It upgrades the webhook/websocket shim
story (sources/shims.py spools frames to files and tails them with
the file source) with a source that OWNS its offsets:

- offset = {"pos": N} over the sorted listing of ``*.jsonl`` files —
  exactly-once across restarts because the checkpoint stores the
  offset and ``readBetweenOffsets`` re-reads the same slice
  deterministically (spool files are append-only and never renamed);
- contrast with the built-in socket source (sources/socket_source.py)
  which has NO replayable offsets (at-most-once) — this is the
  in-sandbox source that demonstrates the durable contract.

Reference parity: the reference's Kafka consumer reads
line-delimited JSON messages and tracks offsets per partition
(reference sqlflow/kafka.py, sources/kafka.py:12); this source is the
same message model (one JSON line = one message, ``value`` column)
over a directory, with the offset/replay machinery in the open.

Scale note: SimpleDataSourceStreamReader reads on the DRIVER — right
for control-plane-rate streams (webhooks, ops events). The
partitioned ``DataSourceStreamReader`` variant (``partitions()`` +
executor-side ``read(partition)``) is the fan-out path when a spool
grows past driver rates; the offset model here (file list positions)
partitions naturally by file.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from sql_flow_spark.sources.base import Source

FORMAT_NAME = "jsonl_spool"


class JsonlSpoolDataSource(DataSource):
    """``readStream.format("jsonl_spool").option("path", dir)`` —
    each line of each ``*.jsonl`` file in the directory becomes a row
    ``(value: string, src_file: string)``; parse ``value`` in handler
    SQL exactly as a Kafka value column."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "value string, src_file string"

    def simpleStreamReader(self, schema):  # noqa: N802 (API name)
        return JsonlSpoolSimpleReader(self.options)


class JsonlSpoolSimpleReader(SimpleDataSourceStreamReader):
    """Offsets over the sorted file listing: {"pos": n} means the
    first n files (sorted by name) are consumed. Spool writers must
    write-then-rename into the directory with monotonically sorting
    names (the shims' spool protocol), so the listing prefix is
    stable and a (start, end) slice replays identically."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_spool requires option 'path'")
        self.path = path

    def _listing(self) -> list[str]:
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return []
        return sorted(
            n for n in names
            if n.endswith(".jsonl") and not n.startswith((".", "_"))
        )

    def _rows(self, names: list[str]) -> list[tuple]:
        # A LIST, not a generator: Spark's prefetch cache copy.copy()s
        # the returned iterator to support replay, and generators are
        # not copyable (TypeError: cannot pickle 'generator').
        # Driver-side materialization is the SimpleReader contract
        # anyway (control-plane rates); the partitioned reader is the
        # volume path.
        out: list[tuple] = []
        for name in names:
            full = os.path.join(self.path, name)
            with open(full, encoding="utf-8") as f:
                for line in f:
                    line = line.rstrip("\n")
                    if line:
                        out.append((line, name))
        return out

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = self._listing()
        pos = int(start.get("pos", 0))
        new = files[pos:]
        return iter(self._rows(new)), {"pos": pos + len(new)}

    def readBetweenOffsets(  # noqa: N802 (API name)
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        files = self._listing()
        return iter(
            self._rows(files[int(start.get("pos", 0)):int(end.get("pos", 0))])
        )

    def commit(self, end: dict) -> None:
        # Spool retention is the operator's policy (files may feed
        # other consumers); nothing to acknowledge upstream.
        pass


_REGISTERED_SESSIONS: set[int] = set()


def register(spark) -> None:
    """Idempotently register the format on this session."""
    key = id(spark)
    if key not in _REGISTERED_SESSIONS:
        spark.dataSource.register(JsonlSpoolDataSource)
        _REGISTERED_SESSIONS.add(key)


class JsonlSpoolSource(Source):
    """Config-level Source wrapper (``source: {type: jsonl_spool,
    path: ...}``) around the registered Python data source."""

    def __init__(self, path: str):
        if not path:
            raise ValueError("jsonl_spool source requires a path")
        self.path = path

    def read(self, spark):
        # Batch backfill over the same spool: identical schema, no
        # offsets needed (one-shot).
        from pyspark.sql import functions as F

        return (
            spark.read.text(os.path.join(self.path, "*.jsonl"))
            .where(F.length(F.trim(F.col("value"))) > 0)
            .select(
                F.col("value"),
                F.element_at(
                    F.split(F.input_file_name(), "/"), -1
                ).alias("src_file"),
            )
        )

    def read_stream(self, spark):
        register(spark)
        return (
            spark.readStream.format(FORMAT_NAME)
            .option("path", self.path)
            .load()
        )
