"""The engine's public column-function API — one import surface.

A user of the reference lake interacts with messages, hashes,
similarity and text signals; this module curates those as composable
`pyspark.sql.Column` builders (plus the few DataFrame-level operators
that need more than a column), re-exported from their implementation
modules. Everything here is JVM-expression-backed unless the docstring
of the underlying function says otherwise — importing from here never
adds a Python boundary that the implementation didn't already have.

    from hcls_data_lake_spark import functions as HF
    df.select(HF.er7_field(seg, 3), HF.cosine("a", "b"))

Implementation homes (kept where their operator families live so the
scale notes in SCALE.md stay adjacent): hl7/er7.py, operators/dedup.py,
operators/similarity.py, operators/layout.py.
"""

from __future__ import annotations

from hcls_data_lake_spark.hl7.er7 import (
    er7_component,
    er7_field,
    er7_segment_ids,
    er7_segments,
    normalize_er7,
    segment_first,
    segments_all,
)
from hcls_data_lake_spark.operators.dedup import (
    hamming64,
    minhash_signature,
    shingles_from_words,
)
from hcls_data_lake_spark.operators.layout import zorder_key
from hcls_data_lake_spark.operators.similarity import (
    cosine,
    dot,
    lsh_bucket,
)

__all__ = [
    # HL7 / ER7 wire format
    "normalize_er7",
    "er7_segments",
    "er7_segment_ids",
    "er7_field",
    "er7_component",
    "segment_first",
    "segments_all",
    # dedup signals
    "shingles_from_words",
    "minhash_signature",
    "hamming64",
    # similarity
    "dot",
    "cosine",
    "lsh_bucket",
    # layout
    "zorder_key",
]
