"""Local replica of the driver's t2 oracle comparison — TYPE-STRICT.

Runs a registered query through Spark and its oracle SQL through DuckDB
on the same parquet tables, then compares row count, column names,
coarse per-column type categories, and order-insensitive TYPE-TAGGED
values (columns sorted by name, rows sorted by all columns).

Why type-tagged (VERDICT r4 "What's wrong" #2): the driver's value-hash
is type-sensitive — DuckDB's SUM(BIGINT) returns HUGEINT, which reaches
the driver's Arrow layer as decimal128(38,0) while Spark emits bigint;
identical values, different renderings, red row. The r4 harness
normalized cells via ``str()``, so ``Decimal('123') == 123`` passed
locally while hash-failing at the driver. This harness must be at least
as strict as the ground truth, so:

* the DuckDB side is fetched **via Arrow** (``fetch_arrow_table()``),
  exactly the path the driver takes — a HUGEINT column materializes as
  ``decimal.Decimal`` cells here, not Python int as ``fetchall()`` would;
* every cell is rendered with a **type-category tag** (``i:`` int,
  ``dec:`` Decimal, ``f:`` float, ``s:`` str, ...), so typing drift is a
  value mismatch;
* both result schemas are mapped to coarse categories and compared, so a
  drifted column is reported BY NAME before any cell diff.

Categories are deliberately coarse: int32 vs int64 are both ``int``
(Arrow→pandas→Python collapses widths the same way at the driver), but
Decimal, float, int, bool, str, bytes, date, and timestamp are all
distinct — the classes the driver's hash actually distinguishes.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

from hcls_data_lake_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            # Spark-written table (e.g. the sf1 key-offset replicas):
            # a directory of part files — DuckDB reads it via a glob
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'"
        )
    return con


def _norm_cell(v):
    """Render a cell with a type-category tag so Decimal(123) != 123."""
    if v is None:
        return "<null>"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "b:true" if v else "b:false"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _norm_cell(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    if isinstance(v, bytes):
        return f"y:{v.hex()}"
    if isinstance(v, datetime.datetime):  # before date: datetime is a date
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    return f"s:{v}"


# -- coarse schema categories ------------------------------------------------

_SPARK_CAT = {
    "boolean": "bool",
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "binary": "bytes",
    "date": "date",
}


def _spark_category(dt: str) -> str:
    dt = dt.lower()
    if dt in _SPARK_CAT:
        return _SPARK_CAT[dt]
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith(("array", "map", "struct")):
        return "nested"
    return dt


def _arrow_category(t) -> str:
    import pyarrow.types as pt

    if pt.is_boolean(t):
        return "bool"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "bytes"
    if pt.is_date(t):
        return "date"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_map(t) or pt.is_struct(t):
        return "nested"
    return str(t)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted_cols, out


def compare(spark, sf_dir: str, name: str, fn, sql: str | None):
    """Returns (ok, message)."""
    from hcls_data_lake_spark.plans import unhashable_output_columns

    sdf = fn(spark, sf_dir)
    # Driver-canonicalizability gate (VERDICT r8 "What's wrong" #3): the
    # driver canonicalizes EVERY output — oracle-less ones included —
    # via toPandas().sort_values(all columns); top-level array/map/
    # struct columns arrive as numpy arrays / dicts and crash the sort
    # (the r8 q_multimodal_binary red). This harness must be at least
    # as strict, so an unhashable output schema fails here regardless
    # of whether an oracle exists.
    unhashable = unhashable_output_columns(sdf)
    if unhashable:
        return (
            False,
            "driver-unhashable output columns (serialize in the final "
            f"projection, the q_agg_collect rule): {unhashable}",
        )
    if sql is None:
        # Replicate the driver's _canon on the rows-only path: pandas
        # must be able to sort the full frame by every column.
        pdf = sdf.toPandas()
        try:
            pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
        except TypeError as ex:  # pragma: no cover - schema gate above
            return (False, f"driver _canon replica crashed: {ex}")
        return (True, f"rows-only: {len(pdf)} rows, canon ok")
    s_cols = sdf.columns
    s_cats = {c: _spark_category(dt) for c, dt in sdf.dtypes}
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    if sql is not None and "/root/testdata/sf0.01" in sql:
        # Oracles that need a literal file path (DuckDB table functions
        # like parquet_metadata only take constants) carry the driver's
        # sf0.01 path; generalize it for local multi-SF sweeps.
        sql = sql.replace("/root/testdata/sf0.01", sf_dir.rstrip("/"))
    try:
        tbl = con.execute(sql).fetch_arrow_table()
    finally:
        con.close()
    d_cols = tbl.column_names
    d_cats = {
        c: _arrow_category(tbl.schema.field(i).type)
        for i, c in enumerate(d_cols)
    }
    d_rows = [tuple(rec[c] for c in d_cols) for rec in tbl.to_pylist()]
    if len(s_rows) != len(d_rows):
        return (False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    if sorted(s_cols) != sorted(d_cols):
        return (
            False,
            f"columns: spark={sorted(s_cols)} duckdb={sorted(d_cols)}",
        )
    drift = {
        c: (s_cats[c], d_cats[c])
        for c in s_cats
        if s_cats[c] != d_cats[c] and "nested" not in (s_cats[c], d_cats[c])
    }
    if drift:
        return (
            False,
            "type drift (spark vs duckdb Arrow): "
            + ", ".join(f"{c}: {a} vs {b}" for c, (a, b) in sorted(drift.items())),
        )
    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    if sr != dr:
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
        )
        return (False, f"values differ at sorted row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
    return (True, f"match: {len(s_rows)} rows")
