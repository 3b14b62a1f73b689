"""Zone storage (A8-A11, A19): lifecycle-partitioned lake layout.

The reference writes ``zone/protocol=<p>/<id>.<fmt>`` objects
(core_stack.yml:151) and catalogs them in DynamoDB
(core_stack.yml:164-172). Here: one parquet root per zone written with
``partitionBy("protocol")`` (real partition pruning), plus a `catalog`
table for point lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# event -> zone mapping (core_stack.yml:141-143)
EVENT_ZONE = {"ingested": "ingestion", "staged": "staging", "error": "error"}


def zone_for_event(df: DataFrame, event_col: str = "event") -> DataFrame:
    """A8: event→zone CASE routing, built FROM EVENT_ZONE so the
    declared mapping and the executed routing cannot drift; unknown
    events route to the error zone."""
    items = iter(EVENT_ZONE.items())
    ev, zn = next(items)
    zone = F.when(F.col(event_col) == ev, zn)
    for ev, zn in items:
        zone = zone.when(F.col(event_col) == ev, zn)
    return df.withColumn("zone", zone.otherwise("error"))


def object_key(df: DataFrame) -> DataFrame:
    """A9: hive-style key assembly
    `zone + '/protocol=' + protocol + '/' + id + '.' + format`
    (core_stack.yml:151)."""
    return df.withColumn(
        "object_key",
        F.concat(
            F.col("zone"),
            F.lit("/protocol="),
            F.col("protocol"),
            F.lit("/"),
            F.col("message_id").cast("string"),
            F.lit("."),
            F.col("format"),
        ),
    )


def write_zone(df: DataFrame, lake_root: str, zone: str, mode: str = "append") -> None:
    """A10: persist one zone partitioned by protocol — the physical
    realization of the reference's key layout; partition pruning
    replaces key-prefix routing (A17)."""
    df.write.mode(mode).partitionBy("protocol").parquet(f"{lake_root}/{zone}")


# Old-reference 4-level layout (ingest_er7_lambda.py:60:
# ``source={}/protocol=hl7v2/format=er7/zone=ingest/{hash}.txt``):
# SOURCE is the leading key because it is the authz boundary — the old
# stack granted readers an IAM prefix per institution
# (hcdl_stack.txt:503-510), so every authorized read was a
# source-prefix listing. The Spark realization is a multi-key
# partitionBy in that exact order: a reader-claims filter prunes whole
# source= directory trees before any file is listed, and the
# protocol/format/zone sub-keys prune the same way CHOICE routing
# (A17) did. At 100 TB the leading source key also bounds the blast
# radius of a compaction or retention pass to one institution's tree.
MULTIKEY_LAYOUT = ("source", "protocol", "format", "zone")


def write_lake_multikey(df: DataFrame, lake_root: str, mode: str = "append") -> None:
    """Persist the old-reference 4-level layout as one partitioned
    table rooted at ``lake_root`` (vs write_zone's per-zone roots)."""
    df.write.mode(mode).partitionBy(*MULTIKEY_LAYOUT).parquet(lake_root)


def read_lake_authz(
    spark: SparkSession,
    lake_root: str,
    read_claims: list[str],
    protocol: str | None = None,
    fmt: str | None = None,
    zone: str | None = None,
) -> DataFrame:
    """Authorized read over the 4-level layout: the reader's
    institution claims become a partition filter on the leading
    ``source`` key (the IAM-prefix authz of hcdl_stack.txt:503-510 as
    partition pruning — unauthorized trees are never listed), with
    optional protocol/format/zone narrowing on the sub-keys."""
    df = spark.read.parquet(lake_root).filter(F.col("source").isin(read_claims))
    if protocol is not None:
        df = df.filter(F.col("protocol") == protocol)
    if fmt is not None:
        df = df.filter(F.col("format") == fmt)
    if zone is not None:
        df = df.filter(F.col("zone") == zone)
    return df


def read_zone(spark: SparkSession, lake_root: str, zone: str) -> DataFrame:
    return spark.read.parquet(f"{lake_root}/{zone}")


def catalog_entries(df: DataFrame, lake_root: str) -> DataFrame:
    """A11: catalog upsert payload `(message_id, bucket, key, source)`
    (core_stack.yml:164-172) — here (message_id, zone, object_key,
    source, ingest_ts)."""
    return df.select(
        "message_id",
        "zone",
        "object_key",
        "source",
        F.current_timestamp().alias("ingest_ts"),
    )


def point_lookup(
    catalog: DataFrame,
    zone_df: DataFrame,
    message_id,
    read_claims: list[str] | None = None,
    fmt: str | None = None,
) -> DataFrame:
    """A19/A20: retrieval API — catalog point lookup joined to the zone
    table, scoped by the reader's institution claims
    (old_reference/hcdl_stack.txt:503-510; front_door_stack.yml:24-32).
    ``fmt`` mirrors the route's format leg
    (``GET /hl7v2/format/{format}/msg_uuid/{msg_uuid}``,
    hcdl_stack.txt:503-510): in a format-fanout lake one message id
    maps to several staged representations (er7/json/txt), and the
    format predicate selects one. Predicate pushdown turns the whole
    thing into a pruned point read (format is a partition key in the
    4-level layout, so the filter prunes directories, not rows)."""
    def _push(df: DataFrame, col: str, pred) -> DataFrame:
        return df.filter(pred(F.col(col))) if col in df.columns else df

    # Every predicate is pushed to EACH side that carries the column,
    # BEFORE the join: on the zone side that is what turns the claims/
    # format filters into partition-directory pruning (the 4-level
    # layout keys), and pre-join filtering is also what keeps a
    # catalog+zone pair that BOTH carry source/format from producing
    # an ambiguous post-join column reference. A format-fanout zone
    # table (several representations per message id) is narrowed to
    # the requested format here, not after the join.
    hit = catalog.filter(F.col("message_id") == message_id)
    zdf = zone_df.filter(F.col("message_id") == message_id)
    if fmt is not None:
        if "format" not in hit.columns and "format" not in zdf.columns:
            raise ValueError(
                "fmt given but neither catalog nor zone table has a"
                " 'format' column"
            )
        hit = _push(hit, "format", lambda c: c == fmt)
        zdf = _push(zdf, "format", lambda c: c == fmt)
    if read_claims is not None:
        hit = _push(hit, "source", lambda c: c.isin(read_claims))
        zdf = _push(zdf, "source", lambda c: c.isin(read_claims))
    # drop catalog-side duplicates of zone columns (besides the join
    # key) so the joined row has one unambiguous column per name
    dup = [c for c in hit.columns if c in zdf.columns and c != "message_id"]
    return hit.drop(*dup).join(zdf, "message_id", "inner")
