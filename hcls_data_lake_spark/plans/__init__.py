"""Plan inspection utilities — the engine's explain/lint toolbox.

Correctness says the answer is right; these helpers make it cheap to
assert the PLAN is right (SURVEY.md §4's posture), both in tests and
interactively while tuning. The same red-flag lint that gates the
registry (tests/test_plans.py) is exposed here so ad-hoc notebooks and
future operators can self-check before benching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RED_FLAGS = (
    # two big relations crossing without a broadcast side
    "CartesianProduct",
    # row-at-a-time Python eval — every boundary should be Arrow-batched
    "BatchEvalPython",
)


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The pre-execution physical plan as text (modes: simple, extended,
    formatted, cost, codegen)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    """The plan actually run, AFTER an action on THIS DataFrame's query
    execution (use `df.collect()`, not `df.count()` — count builds a
    separate execution). With AQE this is the final adaptive plan
    (`isFinalPlan=true`), the only place runtime re-plans (skew splits,
    broadcast conversions, coalesced reads) are visible."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the pre-execution plan — the
    first-order scale cost of a query shape. ReusedExchange lines are
    EXCLUDED: a reused shuffle executes once, and counting it again
    would inflate exactly the plans where Spark did the right thing
    (self-join/self-union exchange reuse)."""
    plan = plan_of(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )


def global_windows(df: DataFrame) -> list[str]:
    """Window nodes fed by an ``Exchange SinglePartition`` — the
    all-rows-to-one-reducer pattern a bare ``Window.orderBy(...)``
    plans as (``Window -> Sort -> Exchange SinglePartition``). Safe
    ONLY over relations bounded by something other than the data
    (calendar days, partition count, a value domain); on anything
    corpus- or dimension-shaped use
    ``operators.ordered.with_global_order`` instead. Returns the
    offending Window lines (empty = clean). WindowGroupLimit is not a
    hit (it's the pre-shuffle top-k pruning node)."""
    lines = plan_of(df, "simple").splitlines()
    hits = []
    for i, line in enumerate(lines):
        stripped = line.strip(" :+-*")
        if not stripped.startswith("Window "):
            continue
        if "_gpid#" in stripped:
            # operators/ordered.with_global_order's offsets window:
            # ≤ num_partitions rows by construction, always safe
            continue
        # a global window's children are Sort -> Exchange SinglePartition,
        # printed on the immediately following lines
        for j in range(i + 1, min(i + 4, len(lines))):
            if "Exchange SinglePartition" in lines[j]:
                hits.append(stripped[:120])
                break
            if "Exchange hashpartitioning" in lines[j]:
                break
    return hits


def unhashable_output_columns(df: DataFrame) -> list[str]:
    """Top-level output columns the driver's canonicalizer cannot
    hash/sort. The correctness harness does ``toPandas().sort_values(by=
    all_columns)`` on EVERY query result; array/map columns arrive as
    numpy arrays / dicts, which pandas cannot compare → ``TypeError:
    unhashable type`` → red row (the r8 q_multimodal_binary /
    q_embed_pca_project failure mode). Struct columns arrive as dicts
    and are equally unsortable. The fix is always in the query's FINAL
    projection: serialize to a deterministic string (`array_join` of
    fixed-precision formatted components, `to_json`, ...) — the
    q_agg_collect discipline (queries/aggregates.py). Returns
    ``["col: type", ...]`` (empty = safe)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def lint(df: DataFrame, allow_bnlj: bool = False) -> list[str]:
    """Red-flag scan of the pre-execution plan. Returns human-readable
    problems (empty list = clean). `allow_bnlj` acknowledges an
    intentional BroadcastNestedLoopJoin (scalar/broadcast-block build
    side); even then the plan must carry a BroadcastExchange."""
    plan = plan_of(df, "simple")
    problems = [flag for flag in RED_FLAGS if flag in plan]
    if "BroadcastNestedLoopJoin" in plan:
        if not allow_bnlj:
            problems.append("BroadcastNestedLoopJoin (not allowed here)")
        elif "BroadcastExchange" not in plan:
            problems.append("BroadcastNestedLoopJoin without broadcast side")
    return problems
