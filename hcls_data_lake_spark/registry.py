"""Query registry: the single source of truth for the t2 contract.

Each declared query (SURVEY.md §2.B) registers a Spark callable
``(spark, sf_dir) -> DataFrame`` together with its DuckDB oracle SQL.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.

Oracle discipline: every computed column is aliased identically in the
Spark code and the SQL; floating aggregates are rounded in both; no
query relies on unspecified row order (the driver's compare is
order-insensitive and sorts columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver runs a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}

_TUNED_SESSIONS: set[int] = set()


def _ensure_tuned(spark: SparkSession) -> None:
    """Apply the engine's performance posture to whichever session runs
    the query (the driver supplies its own): AQE for runtime re-plan /
    skew handling, Arrow for every Python boundary, right-sized shuffle
    parallelism for the local-mode fixture scales (AQE coalescing heals
    over-partitioning for batch, but streaming state stores don't AQE).
    All runtime-settable confs — never touches static ones."""
    key = id(spark)
    if key in _TUNED_SESSIONS:
        return
    try:
        defaults = {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.shuffle.partitions": "32",
        }
        for k, v in defaults.items():
            spark.conf.set(k, v)
    except Exception:
        pass  # a locked-down session still runs, just less tuned
    _TUNED_SESSIONS.add(key)


def register(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query with its oracle SQL (or None)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_tuned(spark)
            return fn(spark, sf_dir)

        tuned.__name__ = fn.__name__
        tuned.__doc__ = fn.__doc__
        REGISTRY[name] = Query(name=name, fn=tuned, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    global _LOADED
    if _LOADED:
        return
    # Imports are deferred so the package imports fast and circular
    # imports (query modules import `register` from here) are safe.
    from hcls_data_lake_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        curation,
        filters,
        functions_pack,
        joins,
        llm,
        pipeline_queries,
        sampling,
        scans,
        setops,
        sorts,
        streaming_queries,
        subqueries,
        timeseries,
        windows,
    )

    _LOADED = True
