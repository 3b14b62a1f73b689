r"""ER7 (HL7v2 wire format) parsing.

Two paths, mirroring SURVEY.md §1.3 / A14:

1. **Native splitter** (`er7_segments`, `er7_field`): pure Spark
   expressions — split on ``\r`` (segments), ``|`` (fields), ``~``
   (repetitions), ``^`` (components), ``&`` (subcomponents). Stays in
   whole-stage codegen; this is the 100 TB path.

2. **Python parser UDF** (`parse_er7_udf`): recursive
   message→segments→fields→components→subcomponents dict/list document,
   emitted as a JSON string (the reference parses with the hl7apy
   grammar, parse_er7_lambda.py:8-69; hl7apy is not installed here, so
   repetition shape is data-driven — a field with ``~`` repetitions
   becomes a list — rather than grammar-driven, and unknown segments are
   preserved instead of raising; parse failures return None which the
   staging chain routes to the error zone, parse_er7_lambda.py:24-27 +
   trigger_lambda.py:32-36).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

SEGMENT_SEP = "\r"
FIELD_SEP = "|"
REP_SEP = "~"
COMP_SEP = "^"
SUBCOMP_SEP = "&"

# --------------------------------------------------------- native path


def normalize_er7(msg: Column) -> Column:
    r"""Segment-delimiter repair: ``\r\n`` / ``\n`` -> ``\r``
    (prepare_er7_lambda.py:9-13)."""
    return F.regexp_replace(msg, "\r\n|\n", "\r")


def er7_segments(msg: Column) -> Column:
    """Array of segment strings."""
    return F.split(normalize_er7(msg), SEGMENT_SEP)


def er7_segment_ids(msg: Column) -> Column:
    """Array of 3-char segment ids (MSH, PID, OBX, ...)."""
    return F.transform(er7_segments(msg), lambda s: F.substring(s, 1, 3))


def er7_field(segment: Column, index: int) -> Column:
    """1-based field from a segment string (MSH counts its own field
    separator as MSH-1, so for MSH segments index i lives at split
    position i-1; this helper follows the common non-MSH convention)."""
    return F.split(segment, "\\" + FIELD_SEP).getItem(index)


def er7_component(field: Column, index: int) -> Column:
    """1-based component from a field string."""
    return F.split(field, "\\" + COMP_SEP).getItem(index - 1)


# ------------------------------------------------------------ UDF path


def _parse_field(raw: str) -> object:
    """Field -> str | dict of components | list of repetitions."""
    if REP_SEP in raw:
        return [_parse_field(rep) for rep in raw.split(REP_SEP)]
    if COMP_SEP in raw:
        return {
            f"C{i + 1}": _parse_subcomponents(c)
            for i, c in enumerate(raw.split(COMP_SEP))
        }
    return _parse_subcomponents(raw)


def _parse_subcomponents(raw: str) -> object:
    if SUBCOMP_SEP in raw:
        return {f"S{i + 1}": s for i, s in enumerate(raw.split(SUBCOMP_SEP))}
    # the reference unwraps the `""` empty-field quirk
    # (parse_er7_lambda.py:48-50)
    return "" if raw == '""' else raw


def parse_er7(msg: str) -> str | None:
    """Parse one ER7 message to a nested JSON document string.

    Segments repeat -> each segment id maps to a LIST of segment dicts
    (repetition-aware shape, parse_er7_lambda.py:57-65); fields are
    ``<SEG>_<n>`` keyed (HL7 short names, parse_er7_lambda.py:41).
    Returns None on structural failure (routed to the error zone)."""
    try:
        text = msg.replace("\r\n", "\r").replace("\n", "\r").strip("\r")
        if not text.startswith("MSH"):
            return None
        doc: dict[str, list] = {}
        for seg in text.split(SEGMENT_SEP):
            if len(seg) < 3:
                continue
            seg_id = seg[:3]
            body: dict[str, object] = {}
            if seg_id == "MSH":
                body["MSH_1"] = seg[3]
                body["MSH_2"] = seg[4:8]
                fields = seg[9:].split(FIELD_SEP)
                offset = 3
            else:
                fields = seg[4:].split(FIELD_SEP)
                offset = 1
            for i, raw in enumerate(fields):
                if raw == "":
                    continue
                if seg_id == "MSH" and i + offset == 2:
                    body[f"{seg_id}_{i + offset}"] = raw  # encoding chars verbatim
                else:
                    body[f"{seg_id}_{i + offset}"] = _parse_field(raw)
            doc.setdefault(seg_id, []).append(body)
        if "MSH" not in doc:
            return None
        return json.dumps(doc, sort_keys=True, ensure_ascii=False)
    except Exception:
        return None


@F.pandas_udf(StringType())
def parse_er7_udf(msgs: pd.Series) -> pd.Series:
    """Arrow-batched ER7->JSON parse (the A14 operator; vectorized so
    the Python boundary is paid per-batch, not per-row)."""
    return msgs.map(lambda m: parse_er7(m) if m is not None else None)
