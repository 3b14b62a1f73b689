"""hcls_data_lake_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of ``aws-samples/hcls-data-lake`` (an
event-driven healthcare document-lake ingestion pipeline; see SURVEY.md)
as an idiomatic Spark library:

- ``pipeline``   — the reference's dataflow operators (ingest, dedup,
  envelope routing, ER7 parse, zone writes) as DataFrame transforms.
- ``queries``    — the declared relational/analytic query inventory
  (SURVEY.md §2.B), each paired with a DuckDB oracle SQL string.
- ``operators``  — reusable relational building blocks (as-of join,
  top-k per group, dedup, similarity search).
- ``functions``  — scalar-function helpers (hashing, HL7 timestamps).
- ``sources``    — lake readers/writers (zoned parquet layout).
- ``streaming``  — Structured Streaming variants of the pipeline.

Everything here is stock PySpark DataFrame API: declare the logical
plan, let Catalyst/Tungsten pick the physical strategy.
"""

from hcls_data_lake_spark.session import get_spark  # noqa: F401
from hcls_data_lake_spark.tables import load_table  # noqa: F401

__version__ = "0.1.0"
