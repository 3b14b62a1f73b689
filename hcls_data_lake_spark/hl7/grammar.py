"""Vendored HL7 v2.x segment-cardinality grammar (ADT + ORU families).

The reference's parser is grammar-driven through hl7apy
(parse_er7_lambda.py:57-65): an element whose grammar allows repetition
serializes as a LIST even when it occurs once, a max-1 element attaches
as a plain dict, and an element unknown to the declared HL7 version
RAISES (trigger_lambda.py routes that to the error zone). hl7apy is not
installable here, so this table vendors the one grammar fact that
drives document shape — per-segment max cardinality — for the message
families the reference corpus exercises (ADT^A01/A02/A08/A34,
ORU^R01, plus the ORU batch framing segments lab02.txt carries).

Cardinality follows the HL7 v2.5.1 abstract message definitions: a
segment is marked repeatable if ANY of the covered message structures
allows it to repeat (the lake stages mixed families into one zone, so
the shape must be stable across them — a per-message-type table would
make the same segment change shape between files).
"""

from __future__ import annotations

# segment id -> max occurrences per message (None = unbounded).
SEGMENT_CARDINALITY: dict[str, int | None] = {
    # envelope / event
    "MSH": 1,
    "EVN": 1,
    "PID": 1,
    "PD1": 1,
    "MRG": 1,  # merge info (ADT^A34)
    "PV1": 1,
    "PV2": 1,
    "ACC": 1,  # accident
    "UB1": 1,
    "UB2": 1,
    # repeatables across ADT structures
    "NK1": None,
    "AL1": None,
    "DG1": None,
    "DRG": None,
    "PR1": None,
    "GT1": None,
    "IN1": None,
    "IN2": None,
    "IN3": None,
    "ROL": None,
    "OBX": None,  # repeats in both ADT (observation) and ORU
    # ORU order/observation groups
    "ORC": None,
    "OBR": None,
    "NTE": None,
    "SPM": None,
    "TQ1": None,
    "CTI": None,
    "FT1": None,
    # batch/file framing (lab02.txt) and continuation
    "FHS": 1,
    "FTS": 1,
    "BHS": 1,
    "BTS": 1,
    "ADD": None,  # addendum/continuation segment
    "DSC": 1,
}


# (segment id -> field numbers that may repeat) per the HL7 v2.5.1
# field definitions, for the segments the reference corpus exercises.
# The reference applies the same repetitions table at FIELD level, not
# just segment level (parse_er7_lambda.py:57-65 runs for every non-leaf
# child): a repeatable field serializes as a LIST even when it occurs
# once — a singleton PID-13 phone is a one-element list, not a dict.
# Unlisted (segment, field) pairs stay data-driven (an explicit `~`
# still produces a list; repetition is never lost).
FIELD_REPEATABLE: dict[str, frozenset[int]] = {
    "MSH": frozenset({18, 21}),
    "EVN": frozenset({5}),
    "PID": frozenset({3, 4, 5, 6, 9, 10, 11, 13, 14, 21, 22, 26, 32}),
    "PD1": frozenset({3, 4}),
    "MRG": frozenset({1}),
    "NK1": frozenset({2, 4, 5, 6, 13, 30, 31, 32}),
    "PV1": frozenset({7, 8, 9, 17, 52}),
    "OBR": frozenset({16, 28}),
    "OBX": frozenset({5, 16, 17, 18}),
    "NTE": frozenset({3}),
    "DG1": frozenset({16}),
    "AL1": frozenset({5}),
    "GT1": frozenset({2, 3, 5, 6, 7}),
    "IN1": frozenset({3, 4, 5, 6, 7, 16, 19}),
}


def is_known(seg_id: str) -> bool:
    return seg_id in SEGMENT_CARDINALITY


def field_repeats(seg_id: str, field_num: int) -> bool:
    """True if the grammar declares SEG-field_num repeatable (so a
    singleton occurrence still serializes as a list). Unknown pairs
    return False — shape falls back to data-driven."""
    return field_num in FIELD_REPEATABLE.get(seg_id, _EMPTY)


_EMPTY: frozenset[int] = frozenset()


def is_repeatable(seg_id: str) -> bool:
    """Unknown segments default to repeatable: their cardinality is
    undeclared, and a list never loses an occurrence (lenient mode
    only — strict mode rejects unknown segments before this matters)."""
    return SEGMENT_CARDINALITY.get(seg_id, None) is None
