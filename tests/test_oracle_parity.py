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
