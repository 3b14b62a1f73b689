"""Structured Streaming layer: the reference's event-driven paths
(SNS fan-out, trigger Lambda, per-message staging) as streaming queries.
"""
