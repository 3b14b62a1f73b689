"""MERGE-style upsert for plain-parquet tables.

The reference's catalog is a DynamoDB put-item per message — last write
wins on `message_id` (core_stack.yml:164-172). Without a transactional
table format, MERGE is expressed relationally: new rows override
existing rows on the key; everything else is carried over. One
full-outer-shaped anti-join + union, single shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str | None = None,
) -> DataFrame:
    """Last-write-wins merge of `updates` into `existing` on `key`.

    Equivalent to ``MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED
    THEN INSERT``. Columns must match by name.

    DynamoDB put-item semantics are one surviving row per key — but a
    DataFrame batch has no arrival order, so "last" inside a batch is
    only defined relative to a version column. Pass ``version_col`` to
    collapse a batch that may carry several versions of one key (keeps
    the highest version, via ``upsert_latest``); without it, ``updates``
    MUST hold one row per key or every version is emitted."""
    if version_col is not None:
        updates = upsert_latest(updates, key, version_col)
    kept = existing.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def upsert_latest(df: DataFrame, key: str, version_col: str) -> DataFrame:
    """Collapse an append-only log to current-state: keep the highest
    version per key (the zone bucket is append-only/versioned,
    core_stack.yml:27-28; 'current record' = max version). Deterministic
    tie-break on the version column only — callers needing total
    determinism should pass a unique version."""
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    effective_col: str,
    tracked_cols: list[str],
    open_end: int = 2**62,
    broadcast_updates: bool = False,
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a batch of updates to a
    versioned dimension, KEEPING history.

    ``current`` carries ``valid_from``/``valid_to`` (epoch ints;
    ``valid_to = open_end`` marks the open row). For each update whose
    tracked attributes differ from the key's open row, the open row is
    closed at the update's ``effective_col`` and a new open row is
    appended; unchanged updates are dropped (no-op churn never writes
    history). Closed history rows pass through untouched, so the input
    partitioning on the key is reusable across runs.

    One shuffle on the key (the join); everything else is map-side.
    The alternative — full-history window scan per batch — rescans
    O(history); this touches only open rows + the batch. The reference
    keeps only last-write state in its catalog (core_stack.yml:164-172,
    DynamoDB put-item); SCD2 is what a lake needs instead when
    "what did this dimension look like when the message arrived?"
    must be answerable (A31 patient updates, adt03_AthenaHealth.txt).

    ``updates`` must hold one row per key (collapse with upsert_latest
    first when a batch can carry several versions of one key).

    ``broadcast_updates=True`` hints the updates side into both probe
    joins — correct sizing for steady-state maintenance where a batch is
    orders of magnitude smaller than the dimension; leave False for
    backfills where the batch itself is large (AQE then picks the
    strategy from observed sizes).
    """
    hist = current.filter(F.col("valid_to") != open_end)
    open_rows = current.filter(F.col("valid_to") == open_end)

    u = updates.select(
        F.col(key),
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        F.col(effective_col).alias("_u_from"),
        # real match indicator: NULL after an unmatched left join. The
        # older `_u_from IS NOT NULL` sentinel silently DISCARDED a
        # matched update whose effective timestamp was null — the row
        # fell into unchanged_open and vanished without an error
        F.lit(True).alias("_u_matched"),
    )
    # validity guards, evaluated lazily inside the plan (no extra
    # jobs): a NULL effective timestamp is malformed input, and an
    # out-of-order one (eff < the open row's valid_from) would close
    # the open row with an INVERTED interval — silently erasing a
    # history period and rewriting the past. Correct late-arriving
    # updates need an interval rebuild, not an open-row close; fail
    # loudly instead of corrupting.
    _guarded_close = F.expr(
        "CASE WHEN _u_from IS NULL THEN"
        " raise_error('scd2_apply: NULL effective timestamp in updates')"
        " WHEN _u_from < valid_from THEN"
        " raise_error(concat('scd2_apply: out-of-order update (eff ', "
        "cast(_u_from as string), ' < open valid_from ', "
        "cast(valid_from as string), ') — late updates need a history"
        " rebuild, not an open-row close'))"
        " ELSE _u_from END"
    )
    # hint only the probe join: in the anti join below u is the
    # preserved (left) side, where a broadcast hint is unusable
    j = open_rows.join(F.broadcast(u) if broadcast_updates else u, key, "left")
    changed = j.filter(
        F.col("_u_matched").isNotNull()
        & ~F.struct(*[F.col(c) for c in tracked_cols]).eqNullSafe(
            F.struct(*[F.col(f"_u_{c}") for c in tracked_cols])
        )
    )
    # open rows: unmatched or no-op updates stay open as-is
    unchanged_open = j.filter(
        F.col("_u_matched").isNull()
        | F.struct(*[F.col(c) for c in tracked_cols]).eqNullSafe(
            F.struct(*[F.col(f"_u_{c}") for c in tracked_cols])
        )
    ).select(*current.columns)
    closed = changed.select(
        *[
            _guarded_close.alias("valid_to") if c == "valid_to" else F.col(c)
            for c in current.columns
        ]
    )
    opened = changed.select(
        *[
            (
                F.col(f"_u_{c}")
                if c in tracked_cols
                else F.col("_u_from")
                if c == "valid_from"
                else F.lit(open_end)
                if c == "valid_to"
                else F.col(c)
            ).alias(c)
            for c in current.columns
        ]
    )
    # brand-new keys (no open row at all); columns outside key/tracked/
    # validity (if any) have no prior value — explicitly null
    _guarded_from = F.expr(
        "CASE WHEN _u_from IS NULL THEN"
        " raise_error('scd2_apply: NULL effective timestamp in updates')"
        " ELSE _u_from END"
    )
    new_keys = u.join(open_rows.select(key), key, "left_anti").select(
        *[
            (
                F.col(key)
                if c == key
                else F.col(f"_u_{c}")
                if c in tracked_cols
                else _guarded_from
                if c == "valid_from"
                else F.lit(open_end)
                if c == "valid_to"
                else F.lit(None)
            ).alias(c)
            for c in current.columns
        ]
    )
    return hist.unionByName(unchanged_open).unionByName(closed).unionByName(
        opened
    ).unionByName(new_keys)


def apply_changes(
    existing: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """CDC APPLY CHANGES: fold a change feed carrying inserts/updates
    ('I'/'U') and deletes ('D') into the current table state — the
    last-write-wins catalog semantics (core_stack.yml:164-172) extended
    with tombstones, which plain ``upsert`` cannot express.

    A batch may carry several changes per key; pass ``version_col`` to
    collapse to the latest (ties would make the survivor undefined).
    The surviving change then either deletes the key or replaces the
    row: one collapse window + one anti-join + one union — the same
    single-key-shuffle cost as upsert. Change rows must carry the
    ``existing`` columns plus op/version."""
    if version_col is not None:
        changes = upsert_latest(changes, key, version_col)
    kept = existing.join(changes.select(key), key, "left_anti")
    # null-safe: a malformed NULL op must fall through as an upsert,
    # not vanish — `op != 'D'` is NULL for null ops, and the key was
    # already anti-joined out of `existing`, so a plain filter would
    # silently DELETE the row instead of erroring or upserting
    survivors = changes.filter(
        ~F.col(op_col).eqNullSafe("D")
    ).select(*existing.columns)
    return kept.unionByName(survivors)
