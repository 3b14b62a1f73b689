"""SparkSession factory with the engine's performance posture.

100 TB posture (SURVEY.md §4/§6): AQE on (runtime join selection, skew
splitting, shuffle-partition coalescing), Arrow for every Python
boundary, broadcast joins for dims under threshold. On a real cluster
the same confs apply; only master/shuffle-partition count change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hcls-data-lake-spark") -> SparkSession:
    """Local session for tests/bench; the driver may supply its own."""
    # Vendored-protobuf activation MUST precede JVM launch: the
    # bootstrap rides PYTHONPATH into the Python workers, whose env is
    # frozen when the JVM starts (compat/protobuf_vendor.py). No-op
    # when a real protobuf installation exists or none can be found.
    from hcls_data_lake_spark.compat.protobuf_vendor import (
        ensure_protobuf_env,
    )

    ensure_protobuf_env()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferWindowGroupLimit pushes rank<=k filters below the window
        # exchange (partial top-k per map task) but only fires for
        # k <= this threshold (default 1000). q_sample_token_budget's
        # result-free rank<=3000 prune needs it at 3000; the rule is
        # scale-independent (it strictly reduces shuffled rows whenever
        # it fires), so raising the cap is safe for every other query.
        .config("spark.sql.optimizer.windowGroupLimitThreshold", "3000")
    )
    return builder.getOrCreate()
