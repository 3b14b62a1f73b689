"""Python Data Source (Spark 4 API): deterministic ER7 message feed.

The reference's ingest is an HTTP POST per message fanned out by SNS
(front_door_lambda.py:12, core_stack.yml:216-231) — an unbounded feed
of small ER7 payloads. This source models that feed as a first-class
Spark table: `spark.read.format("er7gen").option("n", N)` yields N
deterministic messages, split across `numPartitions` input partitions
so generation parallelizes like any other scan (each partition owns a
contiguous id range — no coordination, no driver bottleneck; at 100 TB
the same shape backs a real gateway by mapping partitions to shards).

Every field is a pure function of `msg_id`, so the source is
oracle-checkable: DuckDB reproduces it from `range(n)` (q_scan_pysource)
— the custom source earns the same value-hash verification as the file
formats.

The streaming half (`simpleStreamReader`) replays the same id space in
`batch_size` chunks with offsets `{"next": i}` — the file-event stream
source (A18) shape, but offset-tracked like a queue consumer instead of
directory-listed.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "msg_id BIGINT, sending_app STRING, patient_id STRING, "
    "msg_type STRING, er7 STRING"
)


def _row(i: int) -> tuple:
    """Deterministic message i — mirrored by the DuckDB oracle SQL in
    queries/scans.py::q_scan_pysource (keep the two in lockstep)."""
    app = f"APP{i % 5}"
    pid = f"PID{i:06d}"
    mtype = "ORU^R01" if i % 3 == 0 else "ADT^A01"
    er7 = (
        f"MSH|^~\\&|{app}|FACILITY|RECEIVER|DEST|20240101{i % 24:02d}0000||"
        f"{mtype}|{i}|P|2.6\r"
        f"PID|1||{pid}^^^MRN||PATIENT^TEST^{i % 100}"
    )
    return (i, app, pid, mtype, er7)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ER7Reader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        per = max(1, -(-self.n // self.num_partitions))  # ceil div
        parts = [
            _RangePartition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]
        # the API requires >= 1 partition: an empty list makes Spark
        # invoke read(None); n=0 reports one empty range instead
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class ER7StreamReader(SimpleDataSourceStreamReader):
    """Replay the id space as a rate-limited stream: each micro-batch
    covers [next, next + batch_size) until `n` is exhausted, then idles.
    Offsets are plain dicts, so checkpoint recovery replays exactly."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.batch_size = int(options.get("batchSize", 100))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n)
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # MUST be an iterator, not a list: this path only runs on
        # checkpoint recovery (re-reading a committed-but-unprocessed
        # offset range), where Spark's worker type-checks the return —
        # a list passes every normal-path test and then breaks the
        # first real restart (caught by the restart pytest).
        return iter([_row(i) for i in range(start["next"], end["next"])])


class ER7MessageDataSource(DataSource):
    """format("er7gen") — options: n (row count), numPartitions (batch
    parallelism), batchSize (streaming chunk)."""

    @classmethod
    def name(cls) -> str:
        return "er7gen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ER7Reader:
        return ER7Reader(self.options)

    def simpleStreamReader(self, schema) -> ER7StreamReader:
        return ER7StreamReader(self.options)


def register_er7_source(spark) -> None:
    """Idempotently register the source with a session (safe to call
    from every query). The marker lives ON the session object — an
    id(spark)-keyed module set would both leak stale ids and, worse,
    skip registration when CPython reuses a freed address for a new
    session."""
    if getattr(spark, "_er7gen_registered", False):
        return
    spark.dataSource.register(ER7MessageDataSource)
    spark._er7gen_registered = True
