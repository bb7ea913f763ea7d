"""Custom stateful streaming: the general mechanism behind the
reference's managed tables (arbitrary state kept across batches,
emitted on conditions). Implemented with applyInPandasWithState —
Arrow-batched, state-store backed, watermark-aware."""

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
