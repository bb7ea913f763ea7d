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
