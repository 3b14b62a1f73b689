"""TWS state-protocol floor profile (r8, VERDICT r7 ask #7).

A/B-times the TransformWithState running-totals processor with the
original 3-RPC-per-key state dialogue (exists + get + update) against
the 2-RPC dialogue (get returns None on absent state — the shipped
shape, streaming/stateful.py), plus the topk processor (get + put,
already minimal), interleaved in ONE session so host ambience cancels.

    python tools/profile_tws.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from hcls_data_lake_spark.queries.streaming_queries import (
        read_events_stream,
    )
    from hcls_data_lake_spark.session import get_spark
    from hcls_data_lake_spark.streaming.runner import run_to_memory
    from hcls_data_lake_spark.streaming.stateful import (
        tws_running_totals,
        tws_topk,
    )

    spark = get_spark("tws-profile")
    spark.sparkContext.setLogLevel("ERROR")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    class Totals3RPC(StatefulProcessor):
        """The pre-r8 dialogue: exists + get + update per key."""

        def init(self, handle):
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

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
                    "user_id": [key_tuple[0]],
                    "n_events": [n],
                    "sum_value": [round(total, 2)],
                }
            )

        def close(self):
            pass

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )

    def totals_3rpc(sdf):
        return sdf.groupBy("user_id").transformWithStateInPandas(
            Totals3RPC(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    def run(builder):
        sdf = read_events_stream(spark, sf).select(
            "user_id", "value", "event_id"
        )
        cols = (
            ["user_id", "value"] if builder is not tws_topk
            else ["user_id", "value", "event_id"]
        )
        t0 = time.time()
        out = run_to_memory(
            builder(sdf.select(*cols)),
            output_mode="update",
            shuffle_partitions=8,
            no_data_batches=False,
        )
        n = out.count()
        return time.time() - t0, n

    # warmup both paths once
    run(totals_3rpc)
    run(tws_running_totals)
    run(tws_topk)
    results: dict[str, list[float]] = {"3rpc": [], "2rpc": [], "topk": []}
    for _ in range(reps):
        for label, builder in (
            ("3rpc", totals_3rpc),
            ("2rpc", tws_running_totals),
            ("topk", tws_topk),
        ):
            dt, n = run(builder)
            results[label].append(round(dt, 3))
    for label, runs in results.items():
        runs.sort()
        print(
            f"{label}: min={runs[0]:.3f} median={runs[len(runs) // 2]:.3f} "
            f"runs={runs}"
        )
    cut = 1 - results["2rpc"][0] / results["3rpc"][0]
    print(f"state-dialogue cut (totals, min-vs-min): {cut:.1%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
