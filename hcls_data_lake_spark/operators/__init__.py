"""Reusable relational operators: dedup, similarity search, as-of join,
multimodal plumbing — the engine's building blocks beyond stock Spark.
"""
