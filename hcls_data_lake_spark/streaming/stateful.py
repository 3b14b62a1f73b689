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


def _count_output_schema(sdf: DataFrame, key: str) -> str:
    """Output schema DERIVED from the key column's actual type — a
    hardcoded `user_id bigint` silently mislabels any other key and
    crashes outright on a non-bigint one (the Arrow writer can't coerce
    a string key into the declared bigint slot)."""
    key_type = sdf.schema[key].dataType.simpleString()
    return f"{key} {key_type}, n_events bigint, sum_value double"


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
                key: [key_tuple[0]],
                "n_events": [n],
                "sum_value": [round(total, 2)],
            }
        )

    return sdf.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=_count_output_schema(sdf, key),
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_running_totals(sdf: DataFrame, key: str = "user_id") -> DataFrame:
    """The same per-key running totals on the TransformWithState API
    (Spark 4's successor to applyInPandasWithState): state lives in
    named typed handles (getValueState) instead of one opaque tuple,
    the processor is an object with init/close lifecycle, and the
    runtime requires the RocksDB state store (changelog-checkpointed,
    memory-bounded — the 100 TB state backend; the caller sets the
    provider conf). Emission contract matches running_totals, so the
    same checks verify both APIs.

    ENVIRONMENT GATE: the TransformWithState driver AND data workers
    import `google.protobuf` for the state-server protocol; without it
    the stream crashes at start
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Sessions built by
    hcls.session.get_spark activate the machine's vendored pure-Python
    protobuf runtime and export it to the workers
    (compat/protobuf_vendor), so this TRUE path runs here; callers on a
    foreign session should gate on
    compat.protobuf_vendor.workers_have_protobuf. Requires the RocksDB
    state store provider (TWS state uses multiple column families,
    which HDFSBackedStateStoreProvider cannot host)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    key_field = sdf.schema[key]

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key_tuple, rows, timer_values):
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    # output key column/type derived from the actual grouping column
    # (same reason as _count_output_schema)
    out_schema = StructType(
        [
            StructField(key, key_field.dataType),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    return sdf.groupBy(key).transformWithStateInPandas(
        Totals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
