"""Versioned-manifest table format: commit/read/time-travel/vacuum.

Semantics pinned here: append vs overwrite composition, snapshot
isolation (an old version's read set never changes), atomic
conflict-checked publish (os.link loses cleanly), and vacuum deleting
exactly the unreferenced files.
"""

import os

import pytest

from hcls_data_lake_spark.operators import manifest


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _collect(spark, root, version=None):
    return sorted(
        r.k for r in manifest.read_version(spark, root, version).collect()
    )


def test_append_and_overwrite_compose(spark, tmp_path):
    root = str(tmp_path / "tbl")
    assert manifest.commit(_df(spark, 0, 5), root) == 1
    assert manifest.commit(_df(spark, 5, 8), root, "append") == 2
    assert manifest.commit(_df(spark, 100, 103), root, "overwrite") == 3
    assert _collect(spark, root, 1) == [0, 1, 2, 3, 4]
    assert _collect(spark, root, 2) == list(range(8))
    assert _collect(spark, root, 3) == [100, 101, 102]
    assert _collect(spark, root) == [100, 101, 102]  # HEAD = latest
    assert manifest.versions(root) == [1, 2, 3]


def test_snapshot_isolation_under_later_commits(spark, tmp_path):
    root = str(tmp_path / "tbl")
    manifest.commit(_df(spark, 0, 3), root)
    v1_files = manifest._load(root, 1)["files"]
    for i in range(4):
        manifest.commit(_df(spark, 10 * i, 10 * i + 2), root, "append")
    # v1's planned file set is byte-identical after 4 more commits
    assert manifest._load(root, 1)["files"] == v1_files
    assert _collect(spark, root, 1) == [0, 1, 2]


def test_publish_conflict_retries_to_next_version(spark, tmp_path):
    root = str(tmp_path / "tbl")
    manifest.commit(_df(spark, 0, 3), root)
    # Simulate a concurrent committer winning version 2: pre-create its
    # manifest; our commit must detect EEXIST and land as version 3
    # WITHOUT clobbering the winner.
    winner = os.path.join(root, "_manifests", "v2.json")
    import json

    m1 = manifest._load(root, 1)
    with open(winner, "w") as fh:
        json.dump({**m1, "version": 2}, fh)
    v = manifest.commit(_df(spark, 3, 6), root, "append")
    assert v == 3
    assert manifest._load(root, 2)["version"] == 2  # winner intact
    assert _collect(spark, root, 3) == [0, 1, 2, 3, 4, 5]


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    root = str(tmp_path / "tbl")
    manifest.commit(_df(spark, 0, 3), root)
    manifest.commit(_df(spark, 3, 6), root, "append")
    manifest.commit(_df(spark, 6, 9), root, "overwrite")
    v3_files = set(manifest._load(root, 3)["files"])
    # min_age_s default protects in-flight commits: fresh files survive
    assert manifest.vacuum(root, keep_last=1) == []
    assert manifest.versions(root) == [3]  # manifests expire regardless
    deleted = manifest.vacuum(root, keep_last=1, min_age_s=0)
    # v3 (overwrite) references only its own commit files: v1-v2 data goes
    assert deleted and not (set(deleted) & v3_files)
    assert manifest.versions(root) == [3]
    assert _collect(spark, root) == [6, 7, 8]
    for rel in v3_files:
        assert os.path.exists(os.path.join(root, rel))
    # expired manifests keep their commit metadata readable (the
    # exactly-once replay check must survive retention)
    assert os.path.isdir(os.path.join(root, "_manifests", "expired"))


def test_empty_commit_reads_back_empty_with_schema(spark, tmp_path):
    root = str(tmp_path / "tbl")
    manifest.commit(_df(spark, 0, 5).filter("k < 0"), root)
    got = manifest.read_version(spark, root)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k"]


def test_read_missing_version_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        manifest.read_version(spark, root)
    manifest.commit(_df(spark, 0, 2), root)
    with pytest.raises(FileNotFoundError):
        manifest.read_version(spark, root, 99)


def test_stats_pruning_skips_files_but_not_rows(spark, tmp_path):
    """Three disjoint-range commits; a range prune must cut the file
    list (plan-level skip) while never cutting qualifying rows."""
    root = str(tmp_path / "tbl")
    for lo in (0, 100, 200):
        manifest.commit(
            _df(spark, lo, lo + 10).coalesce(1), root, "append"
        )
    m = manifest._load(root, 3)
    assert len(m["files"]) == 3 and all(
        "k" in m["stats"][f] for f in m["files"]
    )
    pruned = manifest.read_version(spark, root, prune={"k": (100, 109)})
    assert len(pruned.inputFiles()) == 1  # 2 of 3 files never planned
    assert sorted(r.k for r in pruned.filter("k >= 100 AND k <= 109").collect()) == list(
        range(100, 110)
    )
    # open-ended bound
    ge = manifest.read_version(spark, root, prune={"k": (150, None)})
    assert len(ge.inputFiles()) == 1
    # a column with no stats keeps everything
    allf = manifest.read_version(spark, root, prune={"nope": (0, 1)})
    assert len(allf.inputFiles()) == 3


def test_manifest_sink_is_exactly_once_under_replay(spark, sf_dir, tmp_path):
    """Stream the events table into a manifest table via foreachBatch,
    then re-invoke the sink with an already-committed batch_id (what a
    post-crash replay does): version count must not move and the table
    must equal the batch source exactly once."""
    import shutil
    import uuid

    from hcls_data_lake_spark.queries.common import events
    from hcls_data_lake_spark.streaming.manifest_sink import manifest_sink
    from hcls_data_lake_spark.streaming.runner import read_events_stream

    root = str(tmp_path / "lake")
    sink = manifest_sink(root)
    ckpt = str(tmp_path / f"ckpt_{uuid.uuid4().hex[:8]}")
    q = (
        read_events_stream(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vs = manifest.versions(root)
    assert vs, "no batch committed"
    n_expected = events(spark, sf_dir).count()
    assert manifest.read_version(spark, root).count() == n_expected
    # replay every committed batch id — all must be skipped
    replay_df = events(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    for bid in sorted(manifest.committed_meta(root, "batch_id")):
        sink(replay_df, bid)
    assert manifest.versions(root) == vs
    assert manifest.read_version(spark, root).count() == n_expected
    # zombie fence: a FRESH sink closure (stale driver whose cached
    # committed-set predates these commits is the worst case — here it
    # has no cache at all) must also refuse to re-commit, because the
    # batch_id txn check runs INSIDE commit's publish loop
    zombie = manifest_sink(root)
    for bid in sorted(manifest.committed_meta(root, "batch_id")):
        zombie(replay_df, bid)
    assert manifest.versions(root) == vs
    # and commit() itself fences when called directly with txn_key
    bid0 = sorted(manifest.committed_meta(root, "batch_id"))[0]
    assert (
        manifest.commit(
            replay_df, root, meta={"batch_id": bid0}, txn_key="batch_id"
        )
        == 0
    )
    assert manifest.versions(root) == vs
    shutil.rmtree(ckpt, ignore_errors=True)


def test_read_commit_delta_returns_only_that_commits_rows(spark, tmp_path):
    """r7 (q_pipeline_versions support): read_commit_delta(v) must
    return exactly the rows commit v ADDED — the manifest file-list
    diff against v-1 — for append commits; for v=1 the delta IS the
    snapshot; and after an OVERWRITE commit the delta is the full
    replacement set (the diff vs the replaced file list)."""
    from hcls_data_lake_spark.operators import manifest

    root = str(tmp_path / "tbl")
    manifest.commit(spark.range(0, 10).toDF("id"), root, "append")
    manifest.commit(spark.range(10, 15).toDF("id"), root, "append")
    d1 = {r.id for r in manifest.read_commit_delta(spark, root, 1).collect()}
    d2 = {r.id for r in manifest.read_commit_delta(spark, root, 2).collect()}
    assert d1 == set(range(0, 10))
    assert d2 == set(range(10, 15))
    # snapshot v2 = union of the two deltas (append-only invariant)
    assert manifest.read_version(spark, root, 2).count() == 15
    manifest.commit(spark.range(100, 103).toDF("id"), root, "overwrite")
    d3 = {r.id for r in manifest.read_commit_delta(spark, root, 3).collect()}
    assert d3 == {100, 101, 102}
    import pytest

    with pytest.raises(FileNotFoundError):
        manifest.read_commit_delta(spark, root, 9)


def test_committed_files_numeric_batch_order(tmp_path):
    """committed_files must order manifests by NUMERIC batch id —
    lexicographic listing puts batch-10 before batch-2, breaking the
    'in batch order' contract at the 10th micro-batch for any
    ordering-dependent consumer (incremental readers tailing from a
    last-seen batch id)."""
    import json

    from hcls_data_lake_spark.sources.manifest_sink import committed_files

    zone = tmp_path / "zone"
    mdir = zone / "_manifests"
    mdir.mkdir(parents=True)
    for bid in (0, 1, 2, 10, 11):
        (mdir / f"batch-{bid}.json").write_text(
            json.dumps({"batchId": bid, "parts": [{"path": f"p{bid}"}]})
        )
    assert committed_files(str(zone)) == ["p0", "p1", "p2", "p10", "p11"]
