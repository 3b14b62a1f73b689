"""Local replica of the driver's t2 oracle comparison.

Runs a registered query through Spark and its oracle SQL through DuckDB
on the same parquet tables, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by all
columns, floats rounded).
"""

from __future__ import annotations

import math

import duckdb

from hcls_data_lake_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted_cols, out


def compare(spark, sf_dir: str, name: str, fn, sql: str | None):
    """Returns (ok, message)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        return (len(s_rows) >= 0, f"rows-only: {len(s_rows)} rows")
    con = duck_connection(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    if len(s_rows) != len(d_rows):
        return (False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    if sc != dc:
        return (False, f"columns: spark={sc} duckdb={dc}")
    if sr != dr:
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
        )
        return (False, f"values differ at sorted row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
    return (True, f"match: {len(s_rows)} rows")
