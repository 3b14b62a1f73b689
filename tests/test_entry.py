"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_query_has_callable(spark):
    qs = entrymod.queries()
    assert len(qs) >= 80
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_subset_of_queries():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs
