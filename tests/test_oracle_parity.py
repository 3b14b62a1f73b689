"""Differential oracle tests (SURVEY.md §5.2.1) — the t2 gate replica.

Runs every registered query against its DuckDB oracle at sf0.001
(fast); the driver does the same at sf0.01. Full-scale local runs:
``python tests/run_parity.py --sf=/root/testdata/sf0.01``.
"""

from __future__ import annotations

import pytest

from hcls_data_lake_spark import registry
from tests.parity import compare

QUERIES = sorted(registry.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    qs = registry.queries()
    oracles = registry.oracle_sql()
    ok, msg = compare(spark, sf_dir, name, qs[name], oracles.get(name))
    assert ok, f"{name}: {msg}"


def test_strict_harness_catches_hugeint_drift(spark, sf_dir):
    """Self-test for the type-strict harness (VERDICT r4 ask #2).

    Replays the r4 driver failure: DuckDB's SUM(BIGINT) returns HUGEINT
    (Arrow decimal128) while Spark emits bigint — values identical,
    types drifted. The r4 harness normalized via str() and passed this;
    the strict harness must FAIL it, and must name the drifted column.
    """
    qs = registry.queries()
    name = "q_analytics_min_cost_supplier"
    fixed_sql = registry.oracle_sql()[name]
    # Un-fix the oracle: strip the outer int64 pin so DuckDB emits
    # HUGEINT again, exactly the shape that hash-failed at the driver.
    assert "CAST(SUM" in fixed_sql
    broken_sql = fixed_sql.replace("CAST(SUM", "(SUM").replace(
        "AS BIGINT) AS unit_mc", ") AS unit_mc"
    )
    ok, msg = compare(spark, sf_dir, name, qs[name], broken_sql)
    assert not ok, "strict harness failed to catch HUGEINT-vs-bigint drift"
    assert "type drift" in msg and "unit_millicents" in msg, msg
    # ... and the committed (fixed) oracle passes.
    ok, msg = compare(spark, sf_dir, name, qs[name], fixed_sql)
    assert ok, msg
