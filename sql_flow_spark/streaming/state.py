"""Custom stateful streaming: the general mechanism behind the
reference's managed tables (arbitrary state kept across batches,
emitted on conditions). Two implementations of the same TTL'd
running-aggregate semantics:

- ``running_aggregate`` / ``running_aggregate_ttl`` —
  applyInPandasWithState (the legacy-but-stable API; HDFS-backed
  state store works).
- ``running_aggregate_ttl_tws`` — transformWithStateInPandas, the
  Spark 4.x successor (typed state variables + explicit timers,
  RocksDB state store). New code should start here; the parity test
  (test_streaming.py) proves both emit the same rows and both expire
  idle keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_aggregate(
    stream: DataFrame,
    key_column: str,
    value_column: str,
) -> DataFrame:
    """Running per-key (count, sum) maintained across micro-batches —
    update-mode custom state. Output: key, n_events, total_value.

    This is the applyInPandasWithState template users extend for
    richer managed state (session objects, decaying counters, ...).
    """
    output_schema = f"{key_column} long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_column].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_column: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream.groupBy(key_column)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def make_ttl_update(key_column: str, value_column: str, ttl_ms: int):
    """The update function behind running_aggregate_ttl, exposed for
    deterministic unit testing of the timeout branch (firing a real
    processing-time timeout in a test is wall-clock flaky)."""

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_column: [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "expired": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_column].sum())
        state.update((n, total))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                key_column: [key[0]],
                "n_events": [n],
                "total_value": [total],
                "expired": [False],
            }
        )

    return update


def running_aggregate_ttl(
    stream: DataFrame,
    key_column: str,
    value_column: str,
    ttl_ms: int = 60_000,
) -> DataFrame:
    """running_aggregate with a state TTL: a key idle for ``ttl_ms``
    of processing time fires its timeout on the next micro-batch, emits
    a final row with ``expired=true`` and is REMOVED from the state
    store.

    Why this matters at scale: without a TTL, per-key state grows with
    total distinct keys ever seen — on an unbounded keyspace (user ids,
    session ids) the state store becomes the job's memory ceiling. TTL
    expiry caps live state at the working set. This is the
    state-lifecycle half the reference's managed-table delete thread
    implements (reference: sqlflow/managers/window.py poll/delete);
    here the state store handles it natively."""
    output_schema = (
        f"{key_column} long, n_events long, total_value double, expired boolean"
    )
    state_schema = "n long, total double"
    return (
        stream.groupBy(key_column)
        .applyInPandasWithState(
            make_ttl_update(key_column, value_column, ttl_ms),
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ------------------------------- transformWithState (Spark 4.x path)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> tuple[bool, str]:
    """transformWithState needs the ``protobuf`` package (its Python
    state-server protocol is protobuf-encoded; pyspark does not bundle
    it). Probe so callers/tests fail actionably instead of with the
    opaque 'driver worker exited unexpectedly (crashed)'."""
    import importlib.util

    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:  # parent 'google' namespace absent
        spec = None
    if spec is None:
        return False, (
            "transformWithStateInPandas requires the 'protobuf' package "
            "(google.protobuf) for its state-server protocol; install "
            "protobuf>=4 to use running_aggregate_ttl_tws"
        )
    return True, ""


def make_ttl_processor(key_column: str, value_column: str, ttl_ms: int):
    """StatefulProcessor twin of make_ttl_update: a value state holds
    (n, total); every input batch re-arms a processing-time timer
    ttl_ms out (deleting the previous one); an expired timer emits the
    final expired=true row and clears the state — byte-for-byte the
    same output contract as the applyInPandasWithState path."""
    from pyspark.sql.streaming import StatefulProcessor

    class TTLRunningAggregate(StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._agg = handle.getValueState("agg", "n long, total double")
            self._timer = handle.getValueState("timer_at", "t long")

        def _disarm(self):
            if self._timer.exists():
                self._handle.deleteTimer(self._timer.get()[0])
                self._timer.clear()

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_column].sum())
            self._agg.update((n, total))
            self._disarm()
            at = timerValues.getCurrentProcessingTimeInMs() + ttl_ms
            self._handle.registerTimer(at)
            self._timer.update((at,))
            yield pd.DataFrame(
                {
                    key_column: [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "expired": [False],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._agg.exists():
                n, total = self._agg.get()
                yield pd.DataFrame(
                    {
                        key_column: [key[0]],
                        "n_events": [n],
                        "total_value": [total],
                        "expired": [True],
                    }
                )
            self._agg.clear()
            self._timer.clear()

        def close(self):
            pass

    return TTLRunningAggregate()


def running_aggregate_ttl_tws(
    stream: DataFrame,
    key_column: str,
    value_column: str,
    ttl_ms: int = 60_000,
) -> DataFrame:
    """running_aggregate_ttl on the supported Spark 4.x API:
    transformWithStateInPandas with typed state variables and explicit
    processing-time timers. Identical output contract (key, n_events,
    total_value, expired).

    Requires the RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``ROCKSDB_PROVIDER`` before starting the query) — which is the
    provider a 100 TB deployment wants anyway: state spills to local
    SSD + changelog checkpointing instead of living on the JVM heap."""
    output_schema = (
        f"{key_column} long, n_events long, total_value double, expired boolean"
    )
    return stream.groupBy(key_column).transformWithStateInPandas(
        statefulProcessor=make_ttl_processor(key_column, value_column, ttl_ms),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
