"""Custom Python STREAMING SINK via the Data Source API
(DataSourceStreamArrowWriter, Spark 4): a manifest-committed parquet
zone writer — the A10 zone-sink commit protocol
(`write_lambda.py`'s put-then-catalog two-step in the reference)
re-expressed as Spark's executor-write / driver-commit contract.

Mechanics, and why they are the 100 TB shape:

- ``write`` runs per PARTITION on executors and receives PyArrow
  RecordBatches — the Arrow-native writer variant, so bytes flow
  source->sink with no per-row Python and no pandas detour. Each task
  writes one uniquely-named part file (never a rename-in-place) and
  returns only its (path, rowcount) as the commit message.
- ``commit`` runs once per micro-batch on the DRIVER, after every
  task succeeded, and publishes the batch manifest ATOMICALLY
  (tmp-file + os.replace). Readers list manifests, never the data
  directory — uncommitted part files are invisible by construction,
  which is exactly the manifest trick object stores need (S3 has no
  atomic multi-file commit; this is the Iceberg/Delta commit kernel
  in one page).
- ``abort`` deletes the orphaned part files of a failed batch; a
  crash between write and commit leaves garbage data files but NO
  manifest entry, so the zone stays consistent.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class PartMessage(WriterCommitMessage):
    """Executor -> driver commit message: one written part file."""

    path: str
    rows: int


class ManifestSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifestsink"

    def streamWriter(self, schema, overwrite):
        return ManifestStreamWriter(self.options["path"])


class ManifestStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches:
            return PartMessage("", 0)
        tbl = pa.Table.from_batches(batches)
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        fname = os.path.join(
            self.path, "data", f"part-{uuid.uuid4().hex}.parquet"
        )
        pq.write_table(tbl, fname)
        return PartMessage(fname, tbl.num_rows)

    def commit(self, messages, batchId: int) -> None:
        parts = [
            {"path": m.path, "rows": m.rows}
            for m in messages
            if m is not None and m.rows > 0
        ]
        mdir = os.path.join(self.path, "_manifests")
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".batch-{batchId}.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"batchId": batchId, "parts": parts}, f)
        # os.replace is atomic on POSIX: a manifest either exists
        # complete or not at all
        os.replace(tmp, os.path.join(mdir, f"batch-{batchId}.json"))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.path:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


def register_manifest_sink(spark) -> None:
    """Idempotent registration of the manifestsink format."""
    spark.dataSource.register(ManifestSinkDataSource)


def committed_files(zone: str) -> list[str]:
    """The reader half of the protocol: part files listed by COMMITTED
    manifests only, in batch order."""
    mdir = os.path.join(zone, "_manifests")
    if not os.path.isdir(mdir):
        return []
    manifests = [
        f
        for f in os.listdir(mdir)
        if f.startswith("batch-") and f.endswith(".json")
    ]
    # numeric batch order, NOT lexicographic: "batch-10.json" sorts
    # before "batch-2.json" as a string, which would break any
    # ordering-dependent consumer (e.g. an incremental reader tailing
    # from its last-seen batch id) at the 10th micro-batch
    manifests.sort(key=lambda f: int(f[len("batch-") : -len(".json")]))
    files: list[str] = []
    for fname in manifests:
        with open(os.path.join(mdir, fname)) as f:
            files.extend(p["path"] for p in json.load(f)["parts"])
    return files
