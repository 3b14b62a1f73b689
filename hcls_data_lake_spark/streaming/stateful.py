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
            # ONE state-server round-trip, not two: ValueState.get()
            # returns None for an absent value (status 0, empty bytes —
            # value_state_client.py), so the exists() probe is a wasted
            # RPC per key per batch. At fixture scale the cut is noise
            # (-0.9%, tools/profile_tws.py — the state dialogue is NOT
            # the TWS floor; see BASELINE.md r8), but over a real
            # socket each round-trip is a syscall + protobuf
            # serialize/parse per key per batch, so the 3->2 RPC
            # dialogue is the shape to keep.
            got = self._state.get()
            n, total = got if got is not None else (0, 0.0)
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


def tws_topk(sdf: DataFrame, key: str = "user_id", k: int = 3) -> DataFrame:
    """Per-key streaming TOP-K via TransformWithState LIST state — the
    state shape the old applyInPandasWithState API cannot express
    cleanly (its single state tuple would need manual array packing;
    TWS getListState gives an appendable, independently-evolvable typed
    collection). Each batch merges the incoming (value, event_id) rows
    into the key's retained top-k list (value DESC, event_id ASC
    tie-break — fully deterministic) and emits the list as (key, rnk,
    value, event_id) rows. State per key is bounded at k rows by
    construction — the 100 TB property: no key's state grows with its
    event count. Same environment gate as tws_running_totals (vendored
    protobuf + RocksDB provider)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    key_field = sdf.schema[key]

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState(
                "topk", "value DOUBLE, event_id BIGINT"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            cur = [(float(v), int(e)) for (v, e) in self._top.get()]
            for pdf in rows:
                cur.extend(
                    zip(
                        pdf["value"].astype(float),
                        pdf["event_id"].astype(int),
                    )
                )
            cur.sort(key=lambda t: (-t[0], t[1]))
            cur = cur[:k]
            self._top.put(cur)
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(cur),
                    "rnk": list(range(1, len(cur) + 1)),
                    "value": [v for v, _ in cur],
                    "event_id": [e for _, e in cur],
                }
            )

        def close(self) -> None:
            pass

    out_schema = StructType(
        [
            StructField(key, key_field.dataType),
            StructField("rnk", IntegerType()),
            StructField("value", DoubleType()),
            StructField("event_id", LongType()),
        ]
    )
    return sdf.groupBy(key).transformWithStateInPandas(
        TopK(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def pandas_state_topk(
    sdf: DataFrame, key: str = "user_id", k: int = 3
) -> DataFrame:
    """applyInPandasWithState twin of :func:`tws_topk` for sessions
    whose workers lack protobuf: the bounded top-k list rides in two
    ARRAY-typed state fields (the old API's closest analog of TWS list
    state — one opaque row, manually packed). Identical emission
    contract and determinism (value DESC, event_id ASC)."""
    key_type = sdf.schema[key].dataType.simpleString()

    def update(
        key_tuple: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, ids = state.get
            cur = list(zip(vals, ids))
        else:
            cur = []
        for pdf in batches:
            cur.extend(
                zip(pdf["value"].astype(float), pdf["event_id"].astype(int))
            )
        cur.sort(key=lambda t: (-t[0], t[1]))
        cur = cur[:k]
        state.update(
            ([v for v, _ in cur], [int(e) for _, e in cur])
        )
        yield pd.DataFrame(
            {
                key: [key_tuple[0]] * len(cur),
                "rnk": list(range(1, len(cur) + 1)),
                "value": [v for v, _ in cur],
                "event_id": [int(e) for _, e in cur],
            }
        )

    return sdf.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key} {key_type}, rnk int, value double, event_id bigint"
        ),
        stateStructType="vals array<double>, ids array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
