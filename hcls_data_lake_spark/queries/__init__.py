"""Declared query inventory (SURVEY.md §2.B), one module per category.

Each module registers queries via ``hcls_data_lake_spark.registry.register``
with the Spark implementation and the DuckDB oracle SQL side by side.
"""
