"""Custom stateful streaming operators (applyInPandasWithState).

The reference's dedup registry and catalog are per-key state mutated by
each message (front_door_lambda.py:27-31,59-63); in Structured Streaming
that is keyed state managed by the engine. This module implements a
running per-key aggregate with explicit GroupState — the building block
for custom stateful logic the built-in operators can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNT_STATE_SCHEMA = "n bigint, total double"
COUNT_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"


def running_totals(sdf: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running (count, sum) maintained in GroupState; each
    micro-batch emits the key's updated totals. With a single
    availableNow batch the emission equals the batch aggregate, which is
    what the oracle checks; multi-batch behavior is pinned in unit tests."""

    def update(
        key_tuple: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n, total) = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key_tuple[0]],
                "n_events": [n],
                "sum_value": [round(total, 2)],
            }
        )

    return sdf.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=COUNT_OUTPUT_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
