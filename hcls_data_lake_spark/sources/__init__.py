"""Custom sources beyond the built-in file formats.

The reference ingests via an HTTP front door (A1) — a push source. In
Spark the equivalent pull abstraction is the DataSource V2 API; the
Python Data Source API (Spark 4) lets the engine define sources without
JVM code. `er7_source` is the reference's message feed re-expressed as
a partitioned, deterministic generator source (batch + streaming).
"""
