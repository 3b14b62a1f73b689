"""Exactly-once streaming sink into a versioned-manifest table.

Structured Streaming's foreachBatch gives at-least-once batch
delivery: after a crash, the last in-flight micro-batch REPLAYS with
the same batch_id. The reference absorbs replays by keying every
object write on the message id (core_stack.yml:151 — a replayed
publish overwrites the same key; the DynamoDB catalog put is likewise
id-keyed). This sink gives the Parquet lake the same idempotence, at
batch granularity: each micro-batch commits as one manifest version
carrying its batch_id in the commit metadata, and a replayed batch_id
is detected against the committed set and SKIPPED — so downstream
readers see each batch's rows exactly once even across driver
restarts.

Scale posture: the replay check reads manifest metadata only
(O(#versions), no data scan); the commit itself is the manifest
protocol's atomic publish, so a crash mid-commit leaves either no new
version (replay re-commits) or a complete one (replay is skipped) —
never a torn table.
"""

from __future__ import annotations

from hcls_data_lake_spark.operators import manifest


def manifest_sink(root: str, mode: str = "append"):
    """Returns a foreachBatch function committing each micro-batch as
    one manifest version, idempotent under batch replay.

    Usage::

        sdf.writeStream.foreachBatch(manifest_sink(lake_root)) \\
           .option("checkpointLocation", ckpt).start()
    """

    # committed batch ids, loaded from manifest metadata once and kept
    # in the closure: the per-batch replay check is then O(1) instead
    # of re-parsing every manifest JSON per micro-batch (O(N^2) over a
    # long stream). The full disk scan re-runs only on restart (a new
    # closure) — exactly when it must.
    committed: set | None = None

    def _sink(batch_df, batch_id: int) -> None:
        nonlocal committed
        if committed is None:
            committed = manifest.committed_meta(root, "batch_id")
        if batch_id in committed:
            return  # replayed batch — already durable, exactly-once
        # txn_key re-checks the committed set INSIDE the publish loop:
        # a zombie driver and its replacement racing the same batch id
        # cannot both land it (whichever loses the version race
        # re-checks and no-ops) — the cached set above is a fast path,
        # not the fence
        manifest.commit(
            batch_df, root, mode=mode, meta={"batch_id": batch_id},
            txn_key="batch_id",
        )
        committed.add(batch_id)

    return _sink
