"""Time-series regularization queries over the `events` stream table.

Gap-filling an irregular event stream onto a dense per-entity grid is
the batch face of the reference's per-source monitoring need (messages
arrive irregularly per source, core_stack.yml:164-172; the analytics
question is "hourly rate per source, including silent hours"), and the
standard feature-engineering step before any fixed-step model input.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hcls_data_lake_spark.operators.timeseries import gap_fill_locf
from hcls_data_lake_spark.queries.common import events
from hcls_data_lake_spark.registry import register

# DuckDB mirrors the operator exactly: hourly agg -> per-user bounds ->
# generate_series grid -> left join -> IGNORE NULLS running last_value.
# sum(value) is rounded at the hourly-agg level in BOTH engines so the
# forward-filled copies inherit identical rounding.
_GAPFILL_SQL = """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    )
    SELECT g.user_id, g.h, hv.v,
           last_value(hv.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
    FROM grid g
    LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h
"""


@register("q_ts_gapfill", _GAPFILL_SQL)
def q_ts_gapfill(spark, sf_dir):
    """Hourly per-user gap-fill + forward-fill (time_bucket_gapfill /
    locf): densify the sparse (user, hour) activity series onto every
    hour between each user's first and last event, carrying the last
    observed hourly sum forward across silent hours. `v` is null on
    gap rows (fill is distinguishable from fact); `v_ff` is the
    last-observation-carried-forward series a fixed-step consumer
    reads. One shuffle family on user_id (agg, join, fill window) —
    no global sort, entity-parallel at any scale."""
    e = events(spark, sf_dir)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    return gap_fill_locf(
        hourly,
        entity_col="user_id",
        bucket_col="h",
        value_cols=["v"],
        step=F.expr("interval 1 hour"),
    )


# event_id is the unique arrival-order key, so open/close are
# arg_min/arg_max on it — deterministic in both engines (no ts ties to
# break). min/max/arg extremes pass parquet doubles through untouched;
# rounding is applied identically anyway for oracle discipline.
_OHLC_SQL = """
    SELECT user_id, CAST(ts AS DATE) AS d,
           round(arg_min(value, event_id), 2) AS open,
           round(max(value), 2)              AS high,
           round(min(value), 2)              AS low,
           round(arg_max(value, event_id), 2) AS close,
           CAST(count(*) AS BIGINT)          AS n_events
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
"""


@register("q_ts_ohlc", _OHLC_SQL)
def q_ts_ohlc(spark, sf_dir):
    """OHLC-style downsample: per (user, day) the first/last observed
    value in arrival order plus min/max/count — the canonical
    resample-to-bucket summary for irregular series (first/last need
    `min_by`/`max_by`, which a plain GROUP BY can't express). Single
    hash aggregate with map-side partials, no window, no sort — the
    cheapest possible shape for bucket summaries at 100 TB."""
    e = events(spark, sf_dir)
    return e.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(
        F.round(F.min_by("value", "event_id"), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", "event_id"), 2).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


# gaps-and-islands: a session boundary is a gap > 30 min since the
# previous event of the same user; the session id is the running count
# of boundaries. Two stacked windows over ONE shuffle on user_id.
_SESSIONIZE_SQL = """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sess AS (
      SELECT user_id, event_id, ts,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
"""


@register("q_ts_sessionize", _SESSIONIZE_SQL)
def q_ts_sessionize(spark, sf_dir):
    """Batch sessionization (gaps-and-islands): split each user's event
    stream into sessions at >30-minute silences — lag flags boundaries,
    a running sum numbers the islands, then one aggregate summarizes
    each session. The two windows and the final groupBy all partition
    on user_id, so the whole op is ONE shuffle family; this is the
    batch complement of q_stream_session's engine-managed
    session_window (same 30-min gap rule, replayable over history
    instead of incremental over state)."""
    e = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_prev = e.select(
        "user_id", "event_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    # microsecond precision: timestampdiff(SECOND) truncates, so a gap
    # of 1800.5s would compare as 1800 and miss the boundary the
    # oracle's interval comparison sees
    gap_us = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    flagged = with_prev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("prev_ts").isNull() | (gap_us > 30 * 60 * 1000000), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = flagged.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("is_start").over(wrun).cast("bigint").alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "q_ts_dedup_consecutive",
    """
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS prev_type
      FROM events
    )
    SELECT user_id, event_id, event_type
    FROM ordered
    WHERE prev_type IS DISTINCT FROM event_type
    """,
)
def q_ts_dedup_consecutive(spark, sf_dir):
    """Consecutive-duplicate suppression: keep an event only when its
    type DIFFERS from the user's previous event (the sensor/status
    dedup that exact content-hash dedup can't express — the same value
    is legitimate again after an intervening change). One lag window
    per user, null-safe inequality so the first event always survives;
    ordering ties break on event_id so both engines pick identical
    survivors. State is one row per partition — the streaming analog
    is dropDuplicatesWithinWatermark on (user, type) runs."""
    e = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    marked = e.withColumn("prev_type", F.lag("event_type").over(w))
    return marked.filter(
        ~F.col("prev_type").eqNullSafe(F.col("event_type"))
    ).select("user_id", "event_id", "event_type")
