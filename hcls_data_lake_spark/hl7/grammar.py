"""Vendored HL7 v2.x segment-cardinality grammar (ADT/ORU/ORM/ORR/ACK/
VXU/SIU/MDM/DFT/BAR/RDE/RAS families).

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
    # structure-tree members the corpus doesn't carry but the abstract
    # definitions declare (strict mode must not dead-letter them)
    "SFT": None,
    "DB1": None,
    "CTD": 1,
    "TQ2": None,
    "PDA": 1,
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
    # scheduling (SIU) family — r6 grammar-breadth extension
    "SCH": 1,
    "RGS": None,
    "AIS": None,
    "AIG": None,
    "AIL": None,
    "AIP": None,
    # medical document management (MDM) family
    "TXA": 1,
    # r7 grammar-breadth families (VERDICT r6 ask #3): acknowledgment
    # (ACK), general order (ORM_O01), vaccination update (VXU_V04)
    "MSA": 1,
    "ERR": None,
    "RQD": 1,   # max-1 inside ORM_O01's order-detail CHOICE
    "RQ1": 1,
    "RXO": 1,
    "ODS": None,  # dietary orders repeat inside the CHOICE
    "ODT": None,
    "BLG": 1,
    # r9 (VERDICT r8 ask #4): the pharmacy family (RDE_O11 encoded
    # orders, RAS_O17 administrations) makes RXA and RXR repeatable in
    # the union view — RXA repeats within RAS_O17's ADMINISTRATION
    # group and RXR repeats in both RDE/RAS order details; VXU_V04's
    # max-1 shapes are preserved by its per-structure table, which
    # always wins over this union fallback
    "RXA": None,
    "RXR": None,
    "RXE": 1,   # encoded order: one per RDE/RAS ORDER group
    "RXC": None,  # components repeat directly under RDE_O11's ORDER
    "RXD": 1,   # dispense record: one per RDS_O13 ORDER group
    # r8 (VERDICT r7 ask #4): BAR_P05's extra visit-level members
    "ABS": 1,   # abstract
    "BLC": None,  # blood codes repeat
    "RMI": 1,   # risk management incident
    # r11 (VERDICT r10 ask #4): the v2.5 ch.5 query protocol —
    # QBP^Q11 request (QPD parameter definition + RCP response
    # control) and RSP^K11 segment-pattern response (QAK query ack)
    "QPD": 1,
    "RCP": 1,
    "QAK": 1,
    # r11 breadth: master files (ch.8) and scheduling requests (ch.10)
    "MFI": 1,
    "MFE": None,  # one per notified record
    "ARQ": 1,
    "APR": None,  # preferences attach per resource group in SRM
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
    # r7 families (HL7 v2.5 field definitions)
    "ERR": frozenset({1, 2}),
    "RXA": frozenset({9, 10, 17, 18, 19}),
    "RXO": frozenset({6, 7}),
    "ODS": frozenset({2, 3, 4}),
    "ODT": frozenset({2}),
    "FT1": frozenset({19}),
    # r9 pharmacy family (HL7 v2.5 field definitions): RXE-7 provider's
    # administration instructions, RXE-21 supplier's special dispensing
    # instructions, RXE-27 give indication, RXE-31 supplementary code;
    # RXC-7 supplementary code
    "RXE": frozenset({7, 21, 27, 31}),
    "RXC": frozenset({7}),
    "RXD": frozenset({9, 15}),
    "TQ1": frozenset({3, 4, 5, 9}),
    # r11 query protocol: RCP-6 sort-by field and RCP-7 segment group
    # inclusion repeat per the v2.5 ch.5 definitions
    "RCP": frozenset({6, 7}),
    # r11 breadth: MFE-4/5 primary key values (one per key component),
    # ARQ-11 requested ranges + placer contact person/phone, APR's
    # repeating selection criteria
    "MFE": frozenset({4, 5}),
    "ARQ": frozenset({11, 15, 16}),
    "APR": frozenset({1, 2, 3, 5}),
}


# ---------------------------------------------------------------------
# Per-(message structure, segment) cardinality (VERDICT r4 ask #4).
#
# The reference keys repetitions per PARENT structure
# (parse_er7_lambda.py:57-65: `child_element.parent.repetitions[name]`),
# so the same segment can be a dict in one message structure and a list
# in another — e.g. OBR repeats directly under ADT observation use but
# is max-1 within ORU_R01's ORDER_OBSERVATION group. The tables below
# vendor the HL7 v2.5 abstract message definitions for the structures
# the corpus exercises, flattened to segment level: a segment's entry is
# its max cardinality WITHIN ITS IMMEDIATE PARENT (group or message),
# because that is the level at which the reference decides dict-vs-list
# for each occurrence. Segments whose GROUP repeats (e.g. ORU_R01's
# OBR, one per repeating ORDER_OBSERVATION) are therefore max-1 here —
# each occurrence serializes as a dict in the reference's output — and
# the parser's lenient data-driven demotion still yields a list when a
# message actually carries several. Structures not listed (and segments
# a message carries outside its declared structure, e.g. lab02's ADD
# continuation rows, which hl7apy itself would reject) fall back to the
# union table above.

# trigger event (MSH-9.1_9.2) -> abstract structure, HL7 v2.5 mapping
# for the covered families. MSH-9.3, when present, wins over this map.
EVENT_STRUCTURE: dict[str, str] = {
    "ADT_A01": "ADT_A01",
    "ADT_A04": "ADT_A01",
    "ADT_A08": "ADT_A01",
    "ADT_A13": "ADT_A01",
    "ADT_A02": "ADT_A02",
    "ADT_A05": "ADT_A05",
    "ADT_A14": "ADT_A05",
    "ADT_A28": "ADT_A05",
    "ADT_A31": "ADT_A05",
    "ADT_A30": "ADT_A30",
    "ADT_A34": "ADT_A30",
    "ADT_A35": "ADT_A30",
    "ADT_A36": "ADT_A30",
    "ADT_A46": "ADT_A30",
    "ADT_A47": "ADT_A30",
    "ADT_A39": "ADT_A39",
    "ADT_A40": "ADT_A39",
    "ADT_A41": "ADT_A39",
    "ADT_A42": "ADT_A39",
    "ADT_A03": "ADT_A03",
    "ORU_R01": "ORU_R01",
    # scheduling: the S12-S26 notification events share SIU_S12's
    # abstract structure in v2.5
    "SIU_S12": "SIU_S12",
    "SIU_S13": "SIU_S12",
    "SIU_S14": "SIU_S12",
    "SIU_S15": "SIU_S12",
    "SIU_S17": "SIU_S12",
    "SIU_S26": "SIU_S12",
    # document management: the document-content events share MDM_T02's
    # structure (TXA + OBX content) in v2.5
    "MDM_T02": "MDM_T02",
    "MDM_T04": "MDM_T02",
    "MDM_T08": "MDM_T02",
    "MDM_T11": "MDM_T02",
    # r7 families (VERDICT r6 ask #3): general order — O01 covers the
    # ORM order events in v2.5 — and vaccination update
    "ORM_O01": "ORM_O01",
    "VXU_V04": "VXU_V04",
    # financial transaction posting (detail financial transaction)
    "DFT_P03": "DFT_P03",
    # account management (r8 ask #4: the P01 family's sibling triggers
    # are vendored so a new feed of an already-supported family no
    # longer silently falls back to the union table): add (P01),
    # purge (P02), update (P05), end (P06)
    "BAR_P01": "BAR_P01",
    "BAR_P02": "BAR_P02",
    "BAR_P05": "BAR_P05",
    "BAR_P06": "BAR_P06",
    # general-order response (ORM_O01's sibling in the order family —
    # v2.5 defines ORM only for O01; the response side is ORR^O02)
    "ORR_O02": "ORR_O02",
    # r9 (VERDICT r8 ask #4): pharmacy/treatment family — encoded
    # order (RDE^O11) and administration (RAS^O17), the most common
    # real-world hospital feeds not previously vendored
    "RDE_O11": "RDE_O11",
    "RAS_O17": "RAS_O17",
    # dispense (RDS^O13) and dietary order (OMD^O03) complete the
    # pharmacy/dietary order family; RRE^O12 is the pharmacy
    # acknowledgment (RDE -> RRE round-trip, like ORM -> ORR)
    "RDS_O13": "RDS_O13",
    "OMD_O03": "OMD_O03",
    "RRE_O12": "RRE_O12",
    # r10 (VERDICT r9 ask #4, the last named grammar gap): general
    # clinical order (OMG^O19), stock requisition (OMS^O05), and the
    # pharmacy give/dispense acknowledgments (RRA^O18 answers RAS,
    # RRD^O14 answers RDS — completing the order/response pairs the
    # way RDE -> RRE and ORM -> ORR already round-trip)
    "OMG_O19": "OMG_O19",
    "OMS_O05": "OMS_O05",
    "RRA_O18": "RRA_O18",
    "RRD_O14": "RRD_O14",
    # r11 (VERDICT r10 ask #4): the HL7-native point-query protocol —
    # QBP^Q11 query-by-parameter and its RSP^K11 segment-pattern
    # response, the wire-level analog of the reference's retrieval API
    # (old_reference/hcdl_stack.txt:503-510, A19)
    "QBP_Q11": "QBP_Q11",
    "RSP_K11": "RSP_K11",
    # r11 breadth beyond the named ask: master-file notification
    # (MFN^M01 generic record layout) and the scheduling REQUEST side
    # (SRM^S01 family + SRR^S01 responses — the SIU family already
    # covers unsolicited notifications). v2.5 defines the S01-S11
    # request triggers over one SRM structure, like SIU's S12 family.
    "MFN_M01": "MFN_M01",
    "SRM_S01": "SRM_S01",
    "SRM_S02": "SRM_S01",
    "SRM_S03": "SRM_S01",
    "SRM_S04": "SRM_S01",
    "SRM_S09": "SRM_S01",
    "SRM_S10": "SRM_S01",
    "SRM_S11": "SRM_S01",
    "SRR_S01": "SRR_S01",
    "SRR_S02": "SRR_S01",
    "SRR_S03": "SRR_S01",
    "SRR_S04": "SRR_S01",
    # ACK is trigger-agnostic (ACK^A01, ACK^R01, ... all share the
    # 3-segment ACK structure); structure_for special-cases the type,
    # these rows cover senders that spell the trigger without MSH-9.3
    "ACK_A01": "ACK",
    "ACK_A04": "ACK",
    "ACK_A08": "ACK",
    "ACK_R01": "ACK",
    "ACK_O01": "ACK",
    "ACK_V04": "ACK",
}

_ADT_A01_SEGS: dict[str, int | None] = {
    "MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1, "ROL": None,
    "NK1": None, "PV1": 1, "PV2": 1, "DB1": None, "OBX": None,
    "AL1": None, "DG1": None, "DRG": 1,
    # PROCEDURE{PR1, [ROL]} / INSURANCE{IN1, [IN2], [IN3], [ROL]}:
    # max-1 within their repeating group -> dict per occurrence
    "PR1": 1, "GT1": None, "IN1": 1, "IN2": 1, "IN3": 1,
    "ACC": 1, "UB1": 1, "UB2": 1, "PDA": 1,
}

STRUCTURE_SEGMENT_CARDINALITY: dict[str, dict[str, int | None]] = {
    "ADT_A01": _ADT_A01_SEGS,
    "ADT_A02": {
        "MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
        "ROL": None, "PV1": 1, "PV2": 1, "DB1": None, "OBX": None,
        "PDA": 1,
    },
    # A05/A14/A28/A31 share ADT_A05: same flat shape as ADT_A01 minus
    # the PDA death segment
    "ADT_A05": {k: v for k, v in _ADT_A01_SEGS.items() if k != "PDA"},
    # merge, patient-ID-only (A30/A34/...): every segment is max-1
    "ADT_A30": {"MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
                "MRG": 1},
    # merge family with repeating PATIENT group{PID, [PD1], MRG, [PV1]}:
    # all max-1 within the group
    "ADT_A39": {"MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
                "MRG": 1, "PV1": 1},
    # r6 grammar-breadth structures (flat fallback views of the trees;
    # max card WITHIN THE IMMEDIATE PARENT, like the rows above)
    "ADT_A03": {
        "MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
        "ROL": None, "PV1": 1, "PV2": 1, "DB1": None, "DG1": None,
        "DRG": 1, "PR1": 1, "OBX": None, "PDA": 1,
    },
    "SIU_S12": {
        "MSH": 1, "SCH": 1, "TQ1": None, "NTE": None, "PID": 1,
        "PD1": 1, "PV1": 1, "PV2": 1, "OBX": None, "DG1": None,
        "RGS": 1, "AIS": 1, "AIG": 1, "AIL": 1, "AIP": 1,
    },
    "MDM_T02": {
        "MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PV1": 1,
        "ORC": 1, "TQ1": 1, "TQ2": None, "OBR": 1, "NTE": None,
        "TXA": 1, "OBX": 1,
    },
    # r7 grammar-breadth structures (VERDICT r6 ask #3; flat views of
    # the trees below, max card WITHIN THE IMMEDIATE PARENT)
    "ACK": {"MSH": 1, "SFT": None, "MSA": 1, "ERR": None},
    "ORM_O01": {
        "MSH": 1, "NTE": None, "PID": 1, "PD1": 1, "PV1": 1, "PV2": 1,
        "IN1": 1, "IN2": 1, "IN3": 1, "GT1": 1, "AL1": None,
        "ORC": 1, "OBR": 1, "RQD": 1, "RQ1": 1, "RXO": 1,
        "ODS": None, "ODT": None, "CTD": 1, "DG1": None, "OBX": 1,
        "FT1": None, "CTI": None, "BLG": 1,
    },
    "VXU_V04": {
        "MSH": 1, "SFT": None, "PID": 1, "PD1": 1, "NK1": None,
        "PV1": 1, "PV2": 1, "GT1": None, "IN1": 1, "IN2": 1, "IN3": 1,
        "ORC": 1, "TQ1": 1, "TQ2": None, "RXA": 1, "RXR": 1,
        "OBX": 1, "NTE": None,
    },
    "BAR_P01": {
        "MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
        "ROL": None, "PV1": 1, "PV2": 1, "DB1": None, "OBX": None,
        "AL1": None, "DG1": None, "DRG": 1, "PR1": 1, "GT1": None,
        "NK1": None, "IN1": 1, "IN2": 1, "IN3": 1, "ACC": 1,
        "UB1": 1, "UB2": 1,
    },
    # r8 ask #4 structures (flat views, max card WITHIN IMMEDIATE PARENT)
    "BAR_P02": {"MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
                "PV1": 1, "DB1": None},
    "BAR_P05": {
        "MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
        "ROL": None, "PV1": 1, "PV2": 1, "DB1": None, "OBX": None,
        "AL1": None, "DG1": None, "DRG": 1, "PR1": 1, "GT1": None,
        "NK1": None, "IN1": 1, "IN2": 1, "IN3": 1, "ACC": 1,
        "UB1": 1, "UB2": 1, "ABS": 1, "BLC": None, "RMI": 1,
    },
    "BAR_P06": {"MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PV1": 1},
    "ORR_O02": {
        "MSH": 1, "SFT": None, "MSA": 1, "ERR": 1, "NTE": None,
        "PID": 1, "ORC": 1, "OBR": 1, "RQD": 1, "RQ1": 1, "RXO": 1,
        "ODS": None, "ODT": None, "CTI": None,
    },
    # r9 pharmacy structures (flat views of the trees below, max card
    # WITHIN THE IMMEDIATE PARENT; conflicted segments resolve to their
    # FIRST tree occurrence like _flatten_tree — RXR repeats in
    # ORDER_DETAIL, RXC is max-1 within its COMPONENT group)
    "RDE_O11": {
        "MSH": 1, "SFT": None, "NTE": None, "PID": 1, "PD1": 1,
        "PV1": 1, "PV2": 1, "IN1": 1, "IN2": 1, "IN3": 1, "GT1": 1,
        "AL1": None, "ORC": 1, "TQ1": 1, "TQ2": None, "RXO": 1,
        "RXR": None, "RXC": 1, "RXE": 1, "OBX": 1, "FT1": None,
        "BLG": 1, "CTI": None,
    },
    "RAS_O17": {
        "MSH": 1, "SFT": None, "NTE": None, "PID": 1, "PD1": 1,
        "AL1": None, "PV1": 1, "PV2": 1, "ORC": 1, "TQ1": 1,
        "TQ2": None, "RXO": 1, "RXR": None, "RXC": 1, "RXE": 1,
        "RXA": None, "OBX": 1, "CTI": None,
    },
    "RDS_O13": {
        "MSH": 1, "SFT": None, "NTE": None, "PID": 1, "PD1": 1,
        "AL1": None, "PV1": 1, "PV2": 1, "ORC": 1, "TQ1": 1,
        "TQ2": None, "RXO": 1, "RXR": None, "RXC": 1, "RXE": 1,
        "RXD": 1, "OBX": 1, "FT1": None, "CTI": None,
    },
    "OMD_O03": {
        "MSH": 1, "SFT": None, "NTE": None, "PID": 1, "PD1": 1,
        "PV1": 1, "PV2": 1, "IN1": 1, "IN2": 1, "IN3": 1, "GT1": 1,
        "AL1": None, "ORC": 1, "TQ1": 1, "TQ2": None, "ODS": None,
        "OBX": 1, "ODT": None,
    },
    "RRE_O12": {
        "MSH": 1, "SFT": None, "MSA": 1, "ERR": None, "NTE": None,
        "PID": 1, "ORC": 1, "TQ1": 1, "TQ2": None, "RXE": 1,
        "RXR": None, "RXC": None,
    },
    # r10 structures (flat views of the trees below, max card WITHIN
    # THE IMMEDIATE PARENT, first tree occurrence wins on conflicts)
    "OMS_O05": {
        "MSH": 1, "SFT": None, "NTE": None, "PID": 1, "PD1": 1,
        "PV1": 1, "PV2": 1, "IN1": 1, "IN2": 1, "IN3": 1, "GT1": 1,
        "AL1": None, "ORC": 1, "TQ1": 1, "TQ2": None, "RQD": 1,
        "RQ1": 1, "OBX": 1, "BLG": 1,
    },
    "OMG_O19": {
        "MSH": 1, "SFT": None, "NTE": None, "PID": 1, "PD1": 1,
        "PV1": 1, "PV2": 1, "IN1": 1, "IN2": 1, "IN3": 1, "GT1": 1,
        "AL1": None, "ORC": 1, "TQ1": 1, "TQ2": None, "OBR": 1,
        "CTD": 1, "DG1": None, "OBX": 1, "SPM": 1, "FT1": None,
        "CTI": None, "BLG": 1,
    },
    "RRA_O18": {
        "MSH": 1, "SFT": None, "MSA": 1, "ERR": None, "NTE": None,
        "PID": 1, "ORC": 1, "TQ1": 1, "TQ2": None, "RXA": None,
        "RXR": 1,
    },
    "RRD_O14": {
        "MSH": 1, "SFT": None, "MSA": 1, "ERR": None, "NTE": None,
        "PID": 1, "ORC": 1, "TQ1": 1, "TQ2": None, "RXD": 1,
        "RXR": None, "RXC": None,
    },
    # r11 query protocol (flat = tree: the generic Q11/K11 structures
    # have no groups in v2.5 ch.5)
    "QBP_Q11": {"MSH": 1, "SFT": None, "QPD": 1, "RCP": 1, "DSC": 1},
    "RSP_K11": {
        "MSH": 1, "SFT": None, "MSA": 1, "ERR": 1, "QAK": 1,
        "QPD": 1, "DSC": 1,
    },
    # r11 breadth: master files + scheduling request/response (flat
    # views of the trees below; segment max WITHIN IMMEDIATE PARENT)
    "MFN_M01": {"MSH": 1, "SFT": None, "MFI": 1, "MFE": 1},
    "SRM_S01": {
        "MSH": 1, "ARQ": 1, "APR": 1, "NTE": None, "PID": 1,
        "PV1": 1, "PV2": 1, "OBX": None, "DG1": None, "RGS": 1,
        "AIS": 1, "AIG": 1, "AIL": 1, "AIP": 1,
    },
    "SRR_S01": {
        "MSH": 1, "MSA": 1, "ERR": None, "NTE": None, "SCH": 1,
        "PID": 1, "PV1": 1, "PV2": 1, "DG1": None, "RGS": 1,
        "AIS": 1, "AIG": 1, "AIL": 1, "AIP": 1,
    },
    "DFT_P03": {
        "MSH": 1, "SFT": None, "EVN": 1, "PID": 1, "PD1": 1,
        "ROL": None, "PV1": 1, "PV2": 1, "DB1": None,
        "ORC": 1, "OBR": 1, "NTE": None, "OBX": 1,
        "FT1": 1, "PR1": 1, "DG1": None, "DRG": 1, "GT1": None,
        "IN1": 1, "IN2": 1, "IN3": 1, "ACC": 1,
    },
    "ORU_R01": {
        "MSH": 1, "SFT": None, "PID": 1, "PD1": 1, "NTE": None,
        "NK1": None, "PV1": 1, "PV2": 1,
        # ORDER_OBSERVATION{[ORC], OBR, [NTE], [TQ1], [CTD],
        #   OBSERVATION{OBX, [NTE]}, [FT1], [CTI], SPECIMEN{SPM,[OBX]}}
        # OBX is max-1 within OBSERVATION (its dominant parent; the
        # SPECIMEN variant allows repeats — resolved to the dominant
        # shape, and data-driven demotion covers real repeats anyway)
        "ORC": 1, "OBR": 1, "TQ1": None, "CTD": 1, "OBX": 1,
        "FT1": None, "CTI": None, "SPM": 1, "DSC": 1,
    },
}


# ---------------------------------------------------------------------
# Recursive abstract-structure trees (VERDICT r5 ask #3): the reference
# nests segments under GROUP wrappers because hl7apy's message objects
# carry the abstract structure's group hierarchy and the recursion at
# parse_er7_lambda.py:52-69 serializes every non-leaf child — groups
# included — as a dict (max-1 in its parent) or list (repeatable).
# These trees vendor the HL7 v2.5 abstract message definitions for the
# covered structures, with hl7apy's group spelling
# (<STRUCTURE>_<GROUP>). Node = (name, max_card, children); children is
# None for a segment node, a tuple of nodes for a group. max_card is 1
# or None (unbounded), exactly the dict-vs-list decision input.

_S = lambda sid, card: (sid, card, None)  # noqa: E731 — segment node

_ADT_A01_BODY = (
    _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
    _S("PD1", 1), _S("ROL", None), _S("NK1", None), _S("PV1", 1),
    _S("PV2", 1), _S("ROL", None), _S("DB1", None), _S("OBX", None),
    _S("AL1", None), _S("DG1", None), _S("DRG", 1),
)
def _adt_a01_like(structure: str, with_pda: bool):
    """ADT_A01 / ADT_A05 share one body; group names carry the
    structure's own prefix (hl7apy names groups per structure)."""
    return (
        _ADT_A01_BODY
        + (
            (f"{structure}_PROCEDURE", None, (_S("PR1", 1), _S("ROL", None))),
        )
        + (_S("GT1", None),)
        + (
            (
                f"{structure}_INSURANCE",
                None,
                (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1), _S("ROL", None)),
            ),
        )
        + (_S("ACC", 1), _S("UB1", 1), _S("UB2", 1))
        + ((_S("PDA", 1),) if with_pda else ())
    )


STRUCTURE_TREES: dict[str, tuple] = {
    "ADT_A01": _adt_a01_like("ADT_A01", with_pda=True),
    "ADT_A05": _adt_a01_like("ADT_A05", with_pda=False),
    "ADT_A02": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
        _S("PD1", 1), _S("ROL", None), _S("PV1", 1), _S("PV2", 1),
        _S("DB1", None), _S("OBX", None), _S("PDA", 1),
    ),
    "ADT_A30": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
        _S("PD1", 1), _S("MRG", 1),
    ),
    "ADT_A39": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1),
        (
            "ADT_A39_PATIENT",
            None,
            (_S("PID", 1), _S("PD1", 1), _S("MRG", 1), _S("PV1", 1)),
        ),
    ),
    # r6 grammar-breadth structures (HL7 v2.5 abstract definitions,
    # vendored like the rest — new SIU/MDM message types no longer
    # degrade to the union-table fallback on day one)
    "ADT_A03": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
        _S("PD1", 1), _S("ROL", None), _S("PV1", 1), _S("PV2", 1),
        _S("ROL", None), _S("DB1", None), _S("DG1", None), _S("DRG", 1),
        ("ADT_A03_PROCEDURE", None, (_S("PR1", 1), _S("ROL", None))),
        _S("OBX", None), _S("PDA", 1),
    ),
    "SIU_S12": (
        _S("MSH", 1), _S("SCH", 1), _S("TQ1", None), _S("NTE", None),
        (
            "SIU_S12_PATIENT",
            None,
            (
                _S("PID", 1), _S("PD1", 1), _S("PV1", 1), _S("PV2", 1),
                _S("OBX", None), _S("DG1", None),
            ),
        ),
        (
            "SIU_S12_RESOURCES",
            None,
            (
                _S("RGS", 1),
                ("SIU_S12_SERVICE", None, (_S("AIS", 1), _S("NTE", None))),
                (
                    "SIU_S12_GENERAL_RESOURCE",
                    None,
                    (_S("AIG", 1), _S("NTE", None)),
                ),
                (
                    "SIU_S12_LOCATION_RESOURCE",
                    None,
                    (_S("AIL", 1), _S("NTE", None)),
                ),
                (
                    "SIU_S12_PERSONNEL_RESOURCE",
                    None,
                    (_S("AIP", 1), _S("NTE", None)),
                ),
            ),
        ),
    ),
    "MDM_T02": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
        _S("PV1", 1),
        (
            "MDM_T02_COMMON_ORDER",
            None,
            (
                _S("ORC", 1),
                ("MDM_T02_TIMING", None, (_S("TQ1", 1), _S("TQ2", None))),
                _S("OBR", 1), _S("NTE", None),
            ),
        ),
        _S("TXA", 1),
        ("MDM_T02_OBSERVATION", None, (_S("OBX", 1), _S("NTE", None))),
    ),
    # r7 grammar-breadth structures (HL7 v2.5 abstract definitions)
    "ACK": (_S("MSH", 1), _S("SFT", None), _S("MSA", 1), _S("ERR", None)),
    "ORM_O01": (
        _S("MSH", 1), _S("NTE", None),
        (
            "ORM_O01_PATIENT",
            1,
            (
                _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                (
                    "ORM_O01_PATIENT_VISIT",
                    1,
                    (_S("PV1", 1), _S("PV2", 1)),
                ),
                (
                    "ORM_O01_INSURANCE",
                    None,
                    (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1)),
                ),
                _S("GT1", 1), _S("AL1", None),
            ),
        ),
        (
            "ORM_O01_ORDER",
            None,
            (
                _S("ORC", 1),
                (
                    "ORM_O01_ORDER_DETAIL",
                    1,
                    (
                        # the OBR/RQD/RQ1/RXO/ODS/ODT alternation
                        # (hl7apy's CHOICE group)
                        (
                            "ORM_O01_CHOICE",
                            1,
                            (
                                _S("OBR", 1), _S("RQD", 1), _S("RQ1", 1),
                                _S("RXO", 1), _S("ODS", None),
                                _S("ODT", None),
                            ),
                        ),
                        _S("NTE", None), _S("CTD", 1), _S("DG1", None),
                        (
                            "ORM_O01_OBSERVATION",
                            None,
                            (_S("OBX", 1), _S("NTE", None)),
                        ),
                    ),
                ),
                _S("FT1", None), _S("CTI", None), _S("BLG", 1),
            ),
        ),
    ),
    "VXU_V04": (
        _S("MSH", 1), _S("SFT", None), _S("PID", 1), _S("PD1", 1),
        _S("NK1", None),
        ("VXU_V04_PATIENT", 1, (_S("PV1", 1), _S("PV2", 1))),
        _S("GT1", None),
        (
            "VXU_V04_INSURANCE",
            None,
            (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1)),
        ),
        (
            "VXU_V04_ORDER",
            None,
            (
                _S("ORC", 1),
                ("VXU_V04_TIMING", None, (_S("TQ1", 1), _S("TQ2", None))),
                _S("RXA", 1), _S("RXR", 1),
                (
                    "VXU_V04_OBSERVATION",
                    None,
                    (_S("OBX", 1), _S("NTE", None)),
                ),
            ),
        ),
    ),
    "BAR_P01": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
        _S("PD1", 1), _S("ROL", None),
        (
            "BAR_P01_VISIT",
            None,
            (
                _S("PV1", 1), _S("PV2", 1), _S("ROL", None),
                _S("DB1", None), _S("OBX", None), _S("AL1", None),
                _S("DG1", None), _S("DRG", 1),
                (
                    "BAR_P01_PROCEDURE",
                    None,
                    (_S("PR1", 1), _S("ROL", None)),
                ),
                _S("GT1", None), _S("NK1", None),
                (
                    "BAR_P01_INSURANCE",
                    None,
                    (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1),
                     _S("ROL", None)),
                ),
                _S("ACC", 1), _S("UB1", 1), _S("UB2", 1),
            ),
        ),
    ),
    # r8 ask #4: BAR sibling triggers + the ORM family's response side
    # (HL7 v2.5 abstract definitions, hl7apy group spelling)
    "BAR_P02": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1),
        ("BAR_P02_PATIENT", None,
         (_S("PID", 1), _S("PD1", 1), _S("PV1", 1), _S("DB1", None))),
    ),
    "BAR_P05": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
        _S("PD1", 1), _S("ROL", None),
        (
            "BAR_P05_VISIT",
            None,
            (
                _S("PV1", 1), _S("PV2", 1), _S("ROL", None),
                _S("DB1", None), _S("OBX", None), _S("AL1", None),
                _S("DG1", None), _S("DRG", 1),
                (
                    "BAR_P05_PROCEDURE",
                    None,
                    (_S("PR1", 1), _S("ROL", None)),
                ),
                _S("GT1", None), _S("NK1", None),
                (
                    "BAR_P05_INSURANCE",
                    None,
                    (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1),
                     _S("ROL", None)),
                ),
                _S("ACC", 1), _S("UB1", 1), _S("UB2", 1),
                _S("ABS", 1), _S("BLC", None), _S("RMI", 1),
            ),
        ),
    ),
    "BAR_P06": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1),
        ("BAR_P06_PATIENT", None, (_S("PID", 1), _S("PV1", 1))),
    ),
    "ORR_O02": (
        _S("MSH", 1), _S("SFT", None), _S("MSA", 1), _S("ERR", 1),
        _S("NTE", None),
        (
            "ORR_O02_RESPONSE",
            1,
            (
                ("ORR_O02_PATIENT", 1, (_S("PID", 1), _S("NTE", None))),
                (
                    "ORR_O02_ORDER",
                    None,
                    (
                        _S("ORC", 1),
                        (
                            "ORR_O02_CHOICE",
                            1,
                            (
                                _S("OBR", 1), _S("RQD", 1), _S("RQ1", 1),
                                _S("RXO", 1), _S("ODS", None),
                                _S("ODT", None),
                            ),
                        ),
                        _S("NTE", None), _S("CTI", None),
                    ),
                ),
            ),
        ),
    ),
    # r9 ask #4: the pharmacy family (HL7 v2.5 abstract definitions,
    # hl7apy group spelling). RDE_O11 = pharmacy/treatment encoded
    # order: optional PATIENT header, then repeating ORDER groups each
    # carrying the ordering RXO detail (with its route/component
    # subgroups), the mandatory RXE encoded order, encoded
    # timing/route/components, observations and billing. The greedy
    # in-order walk disambiguates the TQ1/RXR/RXC segments that appear
    # BOTH inside ORDER_DETAIL and after RXE: once RXE is consumed the
    # walk position is past ORDER_DETAIL, so later occurrences attach
    # to the encoded groups, exactly hl7apy's assembly order.
    "RDE_O11": (
        _S("MSH", 1), _S("SFT", None), _S("NTE", None),
        (
            "RDE_O11_PATIENT",
            1,
            (
                _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                (
                    "RDE_O11_PATIENT_VISIT",
                    1,
                    (_S("PV1", 1), _S("PV2", 1)),
                ),
                (
                    "RDE_O11_INSURANCE",
                    None,
                    (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1)),
                ),
                _S("GT1", 1), _S("AL1", None),
            ),
        ),
        (
            "RDE_O11_ORDER",
            None,
            (
                _S("ORC", 1),
                (
                    "RDE_O11_TIMING",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                (
                    "RDE_O11_ORDER_DETAIL",
                    1,
                    (
                        _S("RXO", 1), _S("NTE", None), _S("RXR", None),
                        (
                            "RDE_O11_COMPONENT",
                            None,
                            (_S("RXC", 1), _S("NTE", None)),
                        ),
                    ),
                ),
                _S("RXE", 1),
                (
                    "RDE_O11_TIMING_ENCODED",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                _S("RXR", None), _S("RXC", None),
                (
                    "RDE_O11_OBSERVATION",
                    None,
                    (_S("OBX", 1), _S("NTE", None)),
                ),
                _S("FT1", None), _S("BLG", 1), _S("CTI", None),
            ),
        ),
    ),
    # RAS_O17 = pharmacy/treatment administration: the ORDER group ends
    # in a repeating ADMINISTRATION group whose RXA itself repeats
    # (multi-component administrations share one RXR route).
    "RAS_O17": (
        _S("MSH", 1), _S("SFT", None), _S("NTE", None),
        (
            "RAS_O17_PATIENT",
            1,
            (
                _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                _S("AL1", None),
                (
                    "RAS_O17_PATIENT_VISIT",
                    1,
                    (_S("PV1", 1), _S("PV2", 1)),
                ),
            ),
        ),
        (
            "RAS_O17_ORDER",
            None,
            (
                _S("ORC", 1),
                (
                    "RAS_O17_TIMING",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                (
                    "RAS_O17_ORDER_DETAIL",
                    1,
                    (
                        _S("RXO", 1),
                        (
                            "RAS_O17_ORDER_DETAIL_SUPPLEMENT",
                            1,
                            (
                                _S("NTE", None), _S("RXR", None),
                                (
                                    "RAS_O17_COMPONENTS",
                                    None,
                                    (_S("RXC", 1), _S("NTE", None)),
                                ),
                            ),
                        ),
                    ),
                ),
                (
                    "RAS_O17_ENCODED_ORDER",
                    1,
                    (
                        _S("RXE", 1),
                        (
                            "RAS_O17_TIMING_ENCODED",
                            None,
                            (_S("TQ1", 1), _S("TQ2", None)),
                        ),
                        _S("RXR", None), _S("RXC", None),
                    ),
                ),
                (
                    "RAS_O17_ADMINISTRATION",
                    None,
                    (
                        _S("RXA", None), _S("RXR", 1),
                        (
                            "RAS_O17_OBSERVATION",
                            None,
                            (_S("OBX", 1), _S("NTE", None)),
                        ),
                    ),
                ),
                _S("CTI", None),
            ),
        ),
    ),
    # RDS_O13 = pharmacy/treatment dispense: like RAS but the ORDER
    # group centers on the mandatory RXD dispense record (what the
    # pharmacy actually handed out), after optional RXO detail and RXE
    # encoding groups. Same greedy pre/post disambiguation for the
    # repeated TQ1/RXR/RXC members.
    "RDS_O13": (
        _S("MSH", 1), _S("SFT", None), _S("NTE", None),
        (
            "RDS_O13_PATIENT",
            1,
            (
                _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                _S("AL1", None),
                (
                    "RDS_O13_PATIENT_VISIT",
                    1,
                    (_S("PV1", 1), _S("PV2", 1)),
                ),
            ),
        ),
        (
            "RDS_O13_ORDER",
            None,
            (
                _S("ORC", 1),
                (
                    "RDS_O13_TIMING",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                (
                    "RDS_O13_ORDER_DETAIL",
                    1,
                    (
                        _S("RXO", 1),
                        (
                            "RDS_O13_ORDER_DETAIL_SUPPLEMENT",
                            1,
                            (
                                _S("NTE", None), _S("RXR", None),
                                (
                                    "RDS_O13_COMPONENT",
                                    None,
                                    (_S("RXC", 1), _S("NTE", None)),
                                ),
                            ),
                        ),
                    ),
                ),
                (
                    "RDS_O13_ENCODING",
                    1,
                    (
                        _S("RXE", 1),
                        (
                            "RDS_O13_TIMING_ENCODED",
                            None,
                            (_S("TQ1", 1), _S("TQ2", None)),
                        ),
                        _S("RXR", None), _S("RXC", None),
                    ),
                ),
                _S("RXD", 1), _S("RXR", None), _S("RXC", None),
                (
                    "RDS_O13_OBSERVATION",
                    None,
                    (_S("OBX", 1), _S("NTE", None)),
                ),
                _S("FT1", None), _S("CTI", None),
            ),
        ),
    ),
    # RRE_O12 = pharmacy order acknowledgment (the RDE round-trip's
    # response half, mirroring ORM -> ORR): MSA/ERR at message level,
    # then the RESPONSE group with the acknowledged orders' ORC +
    # encoded RXE details.
    "RRE_O12": (
        _S("MSH", 1), _S("SFT", None), _S("MSA", 1), _S("ERR", None),
        _S("NTE", None),
        (
            "RRE_O12_RESPONSE",
            1,
            (
                ("RRE_O12_PATIENT", 1, (_S("PID", 1), _S("NTE", None))),
                (
                    "RRE_O12_ORDER",
                    None,
                    (
                        _S("ORC", 1),
                        (
                            "RRE_O12_TIMING",
                            None,
                            (_S("TQ1", 1), _S("TQ2", None)),
                        ),
                        (
                            "RRE_O12_ENCODING",
                            1,
                            (
                                _S("RXE", 1),
                                (
                                    "RRE_O12_TIMING_ENCODED",
                                    None,
                                    (_S("TQ1", 1), _S("TQ2", None)),
                                ),
                                _S("RXR", None), _S("RXC", None),
                            ),
                        ),
                    ),
                ),
            ),
        ),
    ),
    # OMD_O03 = dietary order: repeating ORDER_DIET groups (ODS diet
    # specifications + observations) then optional tray orders (ODT).
    "OMD_O03": (
        _S("MSH", 1), _S("SFT", None), _S("NTE", None),
        (
            "OMD_O03_PATIENT",
            1,
            (
                _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                (
                    "OMD_O03_PATIENT_VISIT",
                    1,
                    (_S("PV1", 1), _S("PV2", 1)),
                ),
                (
                    "OMD_O03_INSURANCE",
                    None,
                    (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1)),
                ),
                _S("GT1", 1), _S("AL1", None),
            ),
        ),
        (
            "OMD_O03_ORDER_DIET",
            None,
            (
                _S("ORC", 1),
                (
                    "OMD_O03_TIMING_DIET",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                (
                    "OMD_O03_DIET",
                    1,
                    (
                        _S("ODS", None), _S("NTE", None),
                        (
                            "OMD_O03_OBSERVATION",
                            None,
                            (_S("OBX", 1), _S("NTE", None)),
                        ),
                    ),
                ),
            ),
        ),
        (
            "OMD_O03_ORDER_TRAY",
            None,
            (
                _S("ORC", 1),
                (
                    "OMD_O03_TIMING_TRAY",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                _S("ODT", None), _S("NTE", None),
            ),
        ),
    ),
    # r10 (VERDICT r9 ask #4): OMS_O05 = stock requisition order —
    # the general-order family's supply variant: optional PATIENT
    # header (requisitions may be patient-tied or ward stock), then
    # repeating ORDER groups around the mandatory RQD requisition
    # detail and its optional RQ1 supplier detail.
    "OMS_O05": (
        _S("MSH", 1), _S("SFT", None), _S("NTE", None),
        (
            "OMS_O05_PATIENT",
            1,
            (
                _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                (
                    "OMS_O05_PATIENT_VISIT",
                    1,
                    (_S("PV1", 1), _S("PV2", 1)),
                ),
                (
                    "OMS_O05_INSURANCE",
                    None,
                    (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1)),
                ),
                _S("GT1", 1), _S("AL1", None),
            ),
        ),
        (
            "OMS_O05_ORDER",
            None,
            (
                _S("ORC", 1),
                (
                    "OMS_O05_TIMING",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                _S("RQD", 1), _S("RQ1", 1), _S("NTE", None),
                (
                    "OMS_O05_OBSERVATION",
                    None,
                    (_S("OBX", 1), _S("NTE", None)),
                ),
                _S("BLG", 1),
            ),
        ),
    ),
    # OMG_O19 = general clinical order: the OBR-centered order family
    # (what ORM^O01's CHOICE collapses to when the order IS clinical),
    # with per-order observations, specimens, and the PRIOR_RESULT
    # group carrying a previous patient/order/observation context —
    # the deepest nesting in the vendored set (4 group levels). The
    # greedy in-order walk disambiguates the PID/PV1/OBR/OBX
    # occurrences inside PRIOR_RESULT from the header ones: by the
    # time a second PID appears the walk position is past the ORDER
    # group's OBR, so it attaches under PATIENT_PRIOR.
    "OMG_O19": (
        _S("MSH", 1), _S("SFT", None), _S("NTE", None),
        (
            "OMG_O19_PATIENT",
            1,
            (
                _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                (
                    "OMG_O19_PATIENT_VISIT",
                    1,
                    (_S("PV1", 1), _S("PV2", 1)),
                ),
                (
                    "OMG_O19_INSURANCE",
                    None,
                    (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1)),
                ),
                _S("GT1", 1), _S("AL1", None),
            ),
        ),
        (
            "OMG_O19_ORDER",
            None,
            (
                _S("ORC", 1),
                (
                    "OMG_O19_TIMING",
                    None,
                    (_S("TQ1", 1), _S("TQ2", None)),
                ),
                _S("OBR", 1), _S("NTE", None), _S("CTD", 1),
                _S("DG1", None),
                (
                    "OMG_O19_OBSERVATION",
                    None,
                    (_S("OBX", 1), _S("NTE", None)),
                ),
                (
                    "OMG_O19_SPECIMEN",
                    None,
                    (_S("SPM", 1), _S("OBX", None)),
                ),
                (
                    "OMG_O19_PRIOR_RESULT",
                    None,
                    (
                        (
                            "OMG_O19_PATIENT_PRIOR",
                            1,
                            (_S("PID", 1), _S("PD1", 1)),
                        ),
                        (
                            "OMG_O19_PATIENT_VISIT_PRIOR",
                            1,
                            (_S("PV1", 1), _S("PV2", 1)),
                        ),
                        _S("AL1", None),
                        (
                            "OMG_O19_ORDER_PRIOR",
                            None,
                            (
                                _S("ORC", 1), _S("OBR", 1),
                                _S("NTE", None),
                                (
                                    "OMG_O19_TIMING_PRIOR",
                                    None,
                                    (_S("TQ1", 1), _S("TQ2", None)),
                                ),
                                (
                                    "OMG_O19_OBSERVATION_PRIOR",
                                    None,
                                    (_S("OBX", 1), _S("NTE", None)),
                                ),
                            ),
                        ),
                    ),
                ),
                _S("FT1", None), _S("CTI", None), _S("BLG", 1),
            ),
        ),
    ),
    # RRA_O18 = pharmacy administration acknowledgment (answers
    # RAS^O17 the way RRE answers RDE): MSA/ERR at message level, then
    # the RESPONSE group's orders each carrying an optional
    # ADMINISTRATION group — repeating RXA given-doses sharing one RXR
    # route, mirroring RAS's ADMINISTRATION shape.
    "RRA_O18": (
        _S("MSH", 1), _S("SFT", None), _S("MSA", 1), _S("ERR", None),
        _S("NTE", None),
        (
            "RRA_O18_RESPONSE",
            1,
            (
                ("RRA_O18_PATIENT", 1, (_S("PID", 1), _S("NTE", None))),
                (
                    "RRA_O18_ORDER",
                    None,
                    (
                        _S("ORC", 1),
                        (
                            "RRA_O18_TIMING",
                            None,
                            (_S("TQ1", 1), _S("TQ2", None)),
                        ),
                        (
                            "RRA_O18_ADMINISTRATION",
                            1,
                            (_S("RXA", None), _S("RXR", 1)),
                        ),
                    ),
                ),
            ),
        ),
    ),
    # RRD_O14 = pharmacy dispense acknowledgment (answers RDS^O13):
    # same response skeleton, DISPENSE group centered on the RXD
    # record with its repeating routes/components.
    "RRD_O14": (
        _S("MSH", 1), _S("SFT", None), _S("MSA", 1), _S("ERR", None),
        _S("NTE", None),
        (
            "RRD_O14_RESPONSE",
            1,
            (
                ("RRD_O14_PATIENT", 1, (_S("PID", 1), _S("NTE", None))),
                (
                    "RRD_O14_ORDER",
                    None,
                    (
                        _S("ORC", 1),
                        (
                            "RRD_O14_TIMING",
                            None,
                            (_S("TQ1", 1), _S("TQ2", None)),
                        ),
                        (
                            "RRD_O14_DISPENSE",
                            1,
                            (_S("RXD", 1), _S("RXR", None),
                             _S("RXC", None)),
                        ),
                    ),
                ),
            ),
        ),
    ),
    # r11 query protocol (VERDICT r10 ask #4): the generic QBP^Q11 /
    # RSP^K11 structures are flat — no groups — in v2.5 ch.5
    "QBP_Q11": (
        _S("MSH", 1), _S("SFT", None), _S("QPD", 1), _S("RCP", 1),
        _S("DSC", 1),
    ),
    "RSP_K11": (
        _S("MSH", 1), _S("SFT", None), _S("MSA", 1), _S("ERR", 1),
        _S("QAK", 1), _S("QPD", 1), _S("DSC", 1),
    ),
    # r11 breadth: master-file notification — MFI file header, then
    # one MF group per notified record (generic M01 layout, ch.8)
    "MFN_M01": (
        _S("MSH", 1), _S("SFT", None), _S("MFI", 1),
        ("MFN_M01_MF", None, (_S("MFE", 1),)),
    ),
    # scheduling request (ch.10): ARQ appointment request + optional
    # preferences, optional patient, then one group per requested
    # resource with the four service/resource subgroup shapes the SIU
    # family already uses
    "SRM_S01": (
        _S("MSH", 1), _S("ARQ", 1), _S("APR", 1), _S("NTE", None),
        (
            "SRM_S01_PATIENT",
            None,
            (_S("PID", 1), _S("PV1", 1), _S("PV2", 1), _S("OBX", None),
             _S("DG1", None)),
        ),
        (
            "SRM_S01_RESOURCES",
            None,
            (
                _S("RGS", 1),
                ("SRM_S01_SERVICE", None,
                 (_S("AIS", 1), _S("APR", 1), _S("NTE", None))),
                ("SRM_S01_GENERAL_RESOURCE", None,
                 (_S("AIG", 1), _S("APR", 1), _S("NTE", None))),
                ("SRM_S01_LOCATION_RESOURCE", None,
                 (_S("AIL", 1), _S("APR", 1), _S("NTE", None))),
                ("SRM_S01_PERSONNEL_RESOURCE", None,
                 (_S("AIP", 1), _S("APR", 1), _S("NTE", None))),
            ),
        ),
    ),
    # scheduling response: MSA/ERR ack skeleton + the granted SCHEDULE
    "SRR_S01": (
        _S("MSH", 1), _S("MSA", 1), _S("ERR", None), _S("NTE", None),
        (
            "SRR_S01_SCHEDULE",
            1,
            (
                _S("SCH", 1), _S("NTE", None),
                (
                    "SRR_S01_PATIENT",
                    None,
                    (_S("PID", 1), _S("PV1", 1), _S("PV2", 1),
                     _S("DG1", None)),
                ),
                (
                    "SRR_S01_RESOURCES",
                    None,
                    (
                        _S("RGS", 1),
                        ("SRR_S01_SERVICE", None,
                         (_S("AIS", 1), _S("NTE", None))),
                        ("SRR_S01_GENERAL_RESOURCE", None,
                         (_S("AIG", 1), _S("NTE", None))),
                        ("SRR_S01_LOCATION_RESOURCE", None,
                         (_S("AIL", 1), _S("NTE", None))),
                        ("SRR_S01_PERSONNEL_RESOURCE", None,
                         (_S("AIP", 1), _S("NTE", None))),
                    ),
                ),
            ),
        ),
    ),
    "DFT_P03": (
        _S("MSH", 1), _S("SFT", None), _S("EVN", 1), _S("PID", 1),
        _S("PD1", 1), _S("ROL", None), _S("PV1", 1), _S("PV2", 1),
        _S("ROL", None), _S("DB1", None),
        (
            "DFT_P03_COMMON_ORDER",
            None,
            (
                _S("ORC", 1),
                (
                    "DFT_P03_ORDER",
                    1,
                    (_S("OBR", 1), _S("NTE", None)),
                ),
                (
                    "DFT_P03_OBSERVATION",
                    None,
                    (_S("OBX", 1), _S("NTE", None)),
                ),
            ),
        ),
        (
            "DFT_P03_FINANCIAL",
            None,
            (
                _S("FT1", 1),
                (
                    "DFT_P03_FINANCIAL_PROCEDURE",
                    None,
                    (_S("PR1", 1), _S("ROL", None)),
                ),
            ),
        ),
        _S("DG1", None), _S("DRG", 1), _S("GT1", None),
        (
            "DFT_P03_INSURANCE",
            None,
            (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1), _S("ROL", None)),
        ),
        _S("ACC", 1),
    ),
    "ORU_R01": (
        _S("MSH", 1), _S("SFT", None),
        (
            "ORU_R01_PATIENT_RESULT",
            None,
            (
                (
                    "ORU_R01_PATIENT",
                    1,
                    (
                        _S("PID", 1), _S("PD1", 1), _S("NTE", None),
                        _S("NK1", None),
                        ("ORU_R01_VISIT", 1, (_S("PV1", 1), _S("PV2", 1))),
                    ),
                ),
                (
                    "ORU_R01_ORDER_OBSERVATION",
                    None,
                    (
                        _S("ORC", 1), _S("OBR", 1), _S("NTE", None),
                        (
                            "ORU_R01_TIMING_QTY",
                            None,
                            (_S("TQ1", 1), _S("TQ2", None)),
                        ),
                        _S("CTD", 1),
                        (
                            "ORU_R01_OBSERVATION",
                            None,
                            (_S("OBX", 1), _S("NTE", None)),
                        ),
                        _S("FT1", None), _S("CTI", None),
                        (
                            "ORU_R01_SPECIMEN",
                            None,
                            (_S("SPM", 1), _S("OBX", None)),
                        ),
                    ),
                ),
            ),
        ),
        _S("DSC", 1),
    ),
}


def structure_tree(structure: str | None) -> tuple | None:
    """The vendored abstract-structure tree for a resolved message
    structure, or None (-> flat union-table attachment)."""
    if structure is None:
        return None
    return STRUCTURE_TREES.get(structure)


_FIRST_SET_CACHE: dict[tuple, frozenset[str]] = {}


def first_set(node: tuple) -> frozenset[str]:
    """Segment ids that can START an instance of this node — for a
    group, the union over its children (every child is effectively
    optional in lenient matching, so the first set is the full member
    union; greedy in-order matching resolves the ambiguity the same way
    the reference's grammar walk does)."""
    cached = _FIRST_SET_CACHE.get(node)
    if cached is not None:
        return cached
    name, _card, children = node
    if children is None:
        out = frozenset({name})
    else:
        acc: set[str] = set()
        for child in children:
            acc |= first_set(child)
        out = frozenset(acc)
    _FIRST_SET_CACHE[node] = out
    return out


def structure_for(message_type: str, trigger: str, explicit: str | None) -> str | None:
    """Resolve the abstract message structure: MSH-9.3 when the sender
    declared one (adt01 carries ADT^A01^ADT_A01), else the v2.5
    event->structure map; None when the family is not vendored (shape
    then falls back to the union table)."""
    if explicit:
        return explicit if explicit in STRUCTURE_SEGMENT_CARDINALITY else None
    if message_type == "ACK":
        # general acknowledgment: one structure for every trigger
        # (v2.5 ch.2 — the ACK is defined once, echoed per event)
        return "ACK"
    return EVENT_STRUCTURE.get(f"{message_type}_{trigger}")


# ---------------------------------------------------------------------
# Per-(segment, field) datatype (VERDICT r4 ask #5): hl7apy names
# components by the field's datatype (parse_er7_lambda.py:41 uses the
# grammar short name — PID-5's components are XPN_1, XPN_2, ...), not
# positionally. Vendored for the fields the corpus exercises; fields
# not listed keep the synthetic C<n> fallback. OBX-5 is the standard's
# 'varies' type — its datatype comes from the message itself (OBX-2),
# resolved at parse time, exactly how hl7apy assigns it.
FIELD_DATATYPE: dict[str, dict[int, str]] = {
    "MSH": {3: "HD", 4: "HD", 5: "HD", 6: "HD", 7: "TS", 9: "MSG",
            10: "ST", 11: "PT", 12: "VID", 18: "ID", 21: "EI"},
    "EVN": {1: "ID", 2: "TS", 3: "TS", 4: "IS", 5: "XCN", 6: "TS"},
    "PID": {1: "SI", 2: "CX", 3: "CX", 4: "CX", 5: "XPN", 6: "XPN",
            7: "TS", 8: "IS", 9: "XPN", 10: "CE", 11: "XAD", 12: "IS",
            13: "XTN", 14: "XTN", 15: "CE", 16: "CE", 17: "CE",
            18: "CX", 19: "ST", 21: "CX", 22: "CE", 23: "ST",
            26: "CE", 32: "IS"},
    "PD1": {3: "XON", 4: "XCN"},
    "MRG": {1: "CX", 2: "CX", 3: "CX", 4: "CX", 5: "CX", 6: "CX",
            7: "XPN"},
    "NK1": {1: "SI", 2: "XPN", 3: "CE", 4: "XAD", 5: "XTN", 6: "XTN",
            7: "CE", 13: "XON", 30: "XPN", 31: "XTN", 32: "XAD"},
    "PV1": {1: "SI", 2: "IS", 3: "PL", 4: "IS", 5: "CX", 6: "PL",
            7: "XCN", 8: "XCN", 9: "XCN", 10: "IS", 11: "PL",
            14: "IS", 17: "XCN", 18: "IS", 19: "CX", 36: "IS",
            39: "IS", 44: "TS", 45: "TS", 50: "CX", 52: "XCN"},
    "PV2": {1: "PL", 2: "CE", 3: "CE", 4: "CE"},
    "OBX": {1: "SI", 2: "ID", 3: "CE", 4: "ST", 6: "CE", 7: "ST",
            8: "IS", 11: "ID", 13: "ST", 14: "TS", 15: "CE",
            16: "XCN", 17: "CE", 18: "EI"},
    "OBR": {1: "SI", 2: "EI", 3: "EI", 4: "CE", 7: "TS", 8: "TS",
            14: "TS", 16: "XCN", 22: "TS", 25: "ID", 28: "XCN"},
    "NTE": {1: "SI", 2: "ID", 3: "FT"},
    "DG1": {1: "SI", 2: "ID", 3: "CE", 4: "ST", 5: "TS", 6: "IS",
            16: "XCN"},
    "AL1": {1: "SI", 2: "CE", 3: "CE", 4: "IS", 5: "ST", 6: "DT"},
    "GT1": {1: "SI", 2: "CX", 3: "XPN", 4: "XPN", 5: "XAD", 6: "XTN",
            7: "XTN", 8: "TS"},
    "IN1": {1: "SI", 2: "CE", 3: "CX", 4: "XON", 5: "XAD", 6: "XPN",
            7: "XTN", 8: "ST", 12: "DT", 13: "DT", 16: "XPN",
            19: "XAD"},
    "ACC": {1: "TS", 2: "CE"},
    "PR1": {1: "SI", 2: "IS", 3: "CE", 4: "ST", 5: "TS", 6: "IS",
            7: "NM", 8: "CE", 10: "NM", 11: "XCN", 12: "XCN",
            14: "NM", 15: "CE", 16: "CE", 19: "EI", 20: "ID"},
    # r6 grammar-breadth families (HL7 v2.5 definitions, the
    # high-traffic fields; unlisted fields keep the C<n> fallback)
    "SCH": {1: "EI", 2: "EI", 3: "NM", 6: "CE", 7: "CE", 8: "CE",
            9: "NM", 10: "CE", 11: "TQ", 12: "XCN", 16: "XCN",
            20: "XCN", 25: "CE"},
    "RGS": {1: "SI", 2: "ID", 3: "CE"},
    "AIS": {1: "SI", 2: "ID", 3: "CE", 4: "TS", 9: "NM", 10: "CE"},
    "AIG": {1: "SI", 2: "ID", 3: "CE", 4: "CE", 8: "TS"},
    "AIL": {1: "SI", 2: "ID", 3: "PL", 4: "CE", 6: "TS"},
    "AIP": {1: "SI", 2: "ID", 3: "XCN", 4: "CE", 6: "TS"},
    "TXA": {1: "SI", 4: "TS", 5: "XCN", 6: "TS", 7: "TS", 8: "TS",
            9: "XCN", 10: "XCN", 11: "XCN", 12: "EI", 13: "EI",
            14: "EI", 15: "EI", 16: "ST", 17: "ID", 18: "ID",
            22: "PPN", 23: "XCN"},
    # r7 families (ACK / ORM_O01 / VXU_V04 — HL7 v2.5 definitions,
    # high-traffic fields; unlisted fields keep the C<n> fallback)
    "MSA": {1: "ID", 2: "ST", 3: "ST", 4: "NM", 6: "CE"},
    "ERR": {1: "ELD", 2: "ERL", 3: "CWE", 4: "ID", 5: "CWE"},
    "ORC": {1: "ID", 2: "EI", 3: "EI", 4: "EI", 5: "ID", 7: "TQ",
            8: "EIP", 9: "TS", 10: "XCN", 11: "XCN", 12: "XCN",
            13: "PL", 14: "XTN", 15: "TS", 16: "CE", 17: "CE",
            18: "CE", 19: "XCN", 21: "XON"},
    "RXA": {1: "NM", 2: "NM", 3: "TS", 4: "TS", 5: "CE", 6: "NM",
            7: "CE", 9: "CE", 10: "XCN", 15: "ST", 17: "CE",
            18: "CE", 19: "CE", 20: "ID", 21: "ID", 22: "TS"},
    "RXR": {1: "CE", 2: "CWE", 3: "CE", 4: "CE", 5: "CE"},
    "RXO": {1: "CE", 2: "NM", 3: "NM", 4: "CE", 5: "CE", 6: "CE",
            7: "CE", 9: "ID", 10: "NM", 11: "CE"},
    "RQD": {1: "SI", 2: "CE", 3: "CE", 4: "CE", 5: "NM", 6: "CE",
            7: "IS", 8: "IS", 9: "ID", 10: "DT"},
    "RQ1": {1: "ST", 2: "CE", 3: "ST", 4: "CE", 5: "ST", 6: "ID",
            7: "ID"},
    "ODS": {1: "ID", 2: "CE", 3: "CE", 4: "ST"},
    "FT1": {1: "SI", 2: "ST", 3: "ST", 4: "DR", 5: "TS", 6: "IS",
            7: "CE", 9: "ST", 10: "NM", 11: "CP", 12: "CP",
            13: "CE", 14: "CE", 16: "PL", 19: "CE", 20: "XCN",
            21: "XCN", 22: "CP", 25: "CE", 26: "CE"},
    "ODT": {1: "CE", 2: "CE", 3: "ST"},
    "BLG": {1: "CCD", 2: "ID", 3: "CX"},
    # r9 pharmacy family (RDE_O11 / RAS_O17 — HL7 v2.5 definitions,
    # high-traffic fields; unlisted fields keep the C<n> fallback).
    # TQ1 rides along: it was previously untyped (C<n> components)
    # and both pharmacy TIMING groups carry it.
    "TQ1": {1: "SI", 2: "CQ", 3: "RPT", 4: "TM", 5: "CQ", 6: "CQ",
            7: "TS", 8: "TS", 9: "CWE", 10: "TX", 11: "TX", 12: "ID",
            13: "CQ", 14: "NM"},
    "RXE": {1: "TQ", 2: "CE", 3: "NM", 4: "NM", 5: "CE", 6: "CE",
            7: "CE", 8: "LA1", 9: "ID", 10: "NM", 11: "CE", 12: "NM",
            13: "XCN", 14: "XCN", 15: "ST", 16: "NM", 17: "NM",
            18: "TS", 19: "CQ", 20: "ID", 21: "CE", 22: "ST",
            23: "ST", 24: "CE", 25: "NM", 26: "CE", 27: "CE",
            28: "NM", 29: "CE", 30: "ID", 31: "CE"},
    "RXC": {1: "ID", 2: "CE", 3: "NM", 4: "CE", 5: "NM", 6: "CE",
            7: "CE", 8: "NM", 9: "CWE"},
    "RXD": {1: "NM", 2: "CE", 3: "TS", 4: "NM", 5: "CE", 6: "CE",
            7: "ST", 8: "NM", 9: "ST", 10: "XCN", 11: "ID",
            12: "CQ", 14: "ID", 15: "CE", 18: "ST", 19: "TS"},
    # r11 query protocol (HL7 v2.5 ch.5): QPD-1 message query name,
    # QPD-2 query tag; QPD-3+ are query-profile-defined parameters and
    # deliberately stay unlisted (C<n> fallback — never mint keys from
    # profile-specific data). QAK carries the response bookkeeping
    # (status + hit counts); RCP the response-control knobs.
    "QPD": {1: "CE", 2: "ST"},
    "QAK": {1: "ST", 2: "ID", 3: "CE", 4: "NM", 5: "NM", 6: "NM"},
    "RCP": {1: "ID", 2: "CQ", 3: "CE", 4: "TS", 5: "ID", 6: "SRT",
            7: "ID"},
    # r11 breadth: master files (MFI file header / MFE record — MFE-4
    # is the 'varies' primary key, deliberately unlisted -> C<n>) and
    # scheduling request segments (ARQ/APR; SCV selection criteria)
    "MFI": {1: "CE", 2: "HD", 3: "ID", 4: "TS", 5: "TS", 6: "ID"},
    "MFE": {1: "ID", 2: "ST", 3: "TS", 5: "ID"},
    "ARQ": {1: "EI", 2: "EI", 3: "NM", 4: "EI", 7: "CE", 8: "CE",
            9: "NM", 11: "DR", 15: "XCN", 16: "XTN", 19: "XCN",
            20: "XTN"},
    "APR": {1: "SCV", 2: "SCV", 3: "SCV", 4: "NM", 5: "SCV"},
}

# ---------------------------------------------------------------------
# Datatype composition (VERDICT r5 ask #4): hl7apy's recursion bottoms
# out at base ("leaf") datatypes — the reference's
# `child_element.reference[0] == "leaf"` branch assigns the element's
# VALUE verbatim (parse_er7_lambda.py:44-51), so a primitive field or
# component is never split further, while a composite component's
# subcomponents are named by the COMPONENT's own datatype (XPN_1 is an
# FN, so its subcomponents are FN_1, FN_2, ...). PRIMITIVE_TYPES is the
# v2.5 base-datatype set; COMPONENT_DATATYPE maps each vendored
# composite to its components' datatypes (HL7 v2.5 §2.A definitions).
PRIMITIVE_TYPES: frozenset[str] = frozenset(
    {"ST", "TX", "FT", "NM", "SI", "ID", "IS", "DT", "TM", "DTM",
     "TN", "GTS", "NUL"}
)

# composite datatype -> 1-based component index -> that component's own
# datatype. Composite entries (FN, SAD, HD, EI, CE, TS, DR, CWE) drive
# datatype-named subcomponent keys; primitive entries make the
# component a leaf that keeps its raw value (hl7apy's behavior for an
# unescaped '&' inside an ST component — the lab01/lab03 OBX-3 case).
COMPONENT_DATATYPE: dict[str, dict[int, str]] = {
    "CE": {1: "ST", 2: "ST", 3: "ID", 4: "ST", 5: "ST", 6: "ID"},
    "CWE": {1: "ST", 2: "ST", 3: "ID", 4: "ST", 5: "ST", 6: "ID",
            7: "ST", 8: "ST", 9: "ST"},
    "CX": {1: "ST", 2: "ST", 3: "ID", 4: "HD", 5: "ID", 6: "HD",
           7: "DT", 8: "DT", 9: "CWE", 10: "CWE"},
    "XPN": {1: "FN", 2: "ST", 3: "ST", 4: "ST", 5: "ST", 6: "ST",
            7: "ID", 8: "ID", 9: "CE", 10: "DR", 11: "ID", 12: "TS",
            13: "TS", 14: "ST"},
    "XCN": {1: "ST", 2: "FN", 3: "ST", 4: "ST", 5: "ST", 6: "ST",
            7: "IS", 8: "IS", 9: "HD", 10: "ID", 11: "ST", 12: "ST",
            13: "IS", 14: "HD", 15: "ID", 16: "CE", 17: "ID",
            18: "ID", 19: "TS", 20: "TS", 21: "ST", 22: "CWE"},
    "XAD": {1: "SAD", 2: "ST", 3: "ST", 4: "ST", 5: "ST", 6: "ID",
            7: "ID", 8: "ST", 9: "IS", 10: "IS", 11: "ID", 12: "DR",
            13: "TS", 14: "TS"},
    "XTN": {1: "ST", 2: "ID", 3: "ID", 4: "ST", 5: "NM", 6: "NM",
            7: "NM", 8: "NM", 9: "ST", 10: "ST", 11: "ST", 12: "ST"},
    "XON": {1: "ST", 2: "IS", 3: "NM", 4: "NM", 5: "ID", 6: "HD",
            7: "ID", 8: "HD", 9: "ID", 10: "ST"},
    "HD": {1: "IS", 2: "ST", 3: "ID"},
    "EI": {1: "ST", 2: "IS", 3: "ST", 4: "ID"},
    "EIP": {1: "EI", 2: "EI"},
    "MSG": {1: "ID", 2: "ID", 3: "ID"},
    "TS": {1: "DTM", 2: "ID"},
    "DR": {1: "TS", 2: "TS"},
    "PT": {1: "ID", 2: "ID"},
    "VID": {1: "ID", 2: "CE", 3: "CE"},
    "PL": {1: "IS", 2: "IS", 3: "IS", 4: "HD", 5: "IS", 6: "IS",
           7: "IS", 8: "IS", 9: "ST", 10: "EI", 11: "HD"},
    "FN": {1: "ST", 2: "ST", 3: "ST", 4: "ST", 5: "ST"},
    "SAD": {1: "ST", 2: "ST", 3: "ST"},
    "MO": {1: "NM", 2: "ID"},
    "SN": {1: "ST", 2: "NM", 3: "ST", 4: "NM"},
    # r9 (pharmacy family): quantity/timing composites (ORC-7, RXE-1,
    # SCH-11 share TQ) and RXE-8's deliver-to location
    "TQ": {1: "CQ", 2: "RI", 3: "ST", 4: "TS", 5: "TS", 6: "ST",
           7: "ST", 8: "TX", 9: "ID", 11: "CE", 12: "NM"},
    "CQ": {1: "NM", 2: "CE"},
    "RI": {1: "IS", 2: "ST"},
    "LA1": {1: "IS", 2: "IS", 3: "IS", 4: "HD", 5: "IS", 6: "IS",
            7: "IS", 8: "IS", 9: "AD"},
    "AD": {1: "ST", 2: "ST", 3: "ST", 4: "ST", 5: "ST", 6: "ID",
           7: "ID", 8: "ST"},
    # r11 query protocol: RCP-6's sort-by composite
    "SRT": {1: "ST", 2: "ID"},
    # r11 scheduling: APR's selection-criteria composite
    "SCV": {1: "IS", 2: "ST"},
    # r7 (ERR/BLG support)
    "ELD": {1: "ST", 2: "NM", 3: "NM", 4: "CE"},
    "ERL": {1: "ST", 2: "NM", 3: "NM", 4: "NM", 5: "NM", 6: "NM"},
    "CCD": {1: "ID", 2: "TS"},
    "CP": {1: "MO", 2: "ID", 3: "NM", 4: "NM", 5: "CE", 6: "ID"},
}


def component_datatype(dt: str | None, comp_num: int) -> str | None:
    """Datatype of component ``comp_num`` within composite ``dt``, or
    None when either is unknown (-> synthetic S<n> subcomponent keys,
    the never-lose-data fallback)."""
    if dt is None:
        return None
    return COMPONENT_DATATYPE.get(dt, _EMPTY_DT).get(comp_num)


# OBX-2 value-type tokens that legally type OBX-5 (v2.5 table 0125
# subset the corpus uses + common clinical types). Anything else keeps
# the C<n> fallback rather than minting keys from arbitrary data.
VARIES_TYPES: frozenset[str] = frozenset(
    {"CE", "CWE", "CF", "CX", "DT", "ED", "FT", "ID", "IS", "NM",
     "RP", "SN", "ST", "TM", "TS", "TX", "XAD", "XCN", "XON", "XPN"}
)


def field_datatype(seg_id: str, field_num: int) -> str | None:
    """Datatype short name for SEG-field_num, or None (-> C<n> keys)."""
    return FIELD_DATATYPE.get(seg_id, _EMPTY_DT).get(field_num)


_EMPTY_DT: dict[int, str] = {}


def is_known(seg_id: str) -> bool:
    return seg_id in SEGMENT_CARDINALITY


def field_repeats(seg_id: str, field_num: int) -> bool:
    """True if the grammar declares SEG-field_num repeatable (so a
    singleton occurrence still serializes as a list). Unknown pairs
    return False — shape falls back to data-driven."""
    return field_num in FIELD_REPEATABLE.get(seg_id, _EMPTY)


_EMPTY: frozenset[int] = frozenset()


def is_repeatable(seg_id: str, structure: str | None = None) -> bool:
    """Unknown segments default to repeatable: their cardinality is
    undeclared, and a list never loses an occurrence (lenient mode
    only — strict mode rejects unknown segments before this matters).

    When ``structure`` names a vendored message structure, its
    per-structure table wins (the reference keys repetitions per parent
    structure — parse_er7_lambda.py:57-65); a segment the structure
    does not declare, or an unknown structure, falls back to the
    union-over-families table so no occurrence is ever lost."""
    if structure is not None:
        per = STRUCTURE_SEGMENT_CARDINALITY.get(structure)
        if per is not None and seg_id in per:
            return per[seg_id] is None
    return SEGMENT_CARDINALITY.get(seg_id, None) is None


# =====================================================================
# Version-keyed grammar (r8, VERDICT r7 ask #2).
#
# The reference parses with hl7apy's *declared-version* grammar:
# parser.parse_message (parse_er7_lambda.py:10) resolves MSH-12 and
# loads that version's tables, so the same wire bytes shape differently
# under 2.3 than under 2.5 (e.g. MSH-9 is a CM_MSG in 2.3/2.3.1 but an
# MSG in 2.5; XPN-1 is a plain ST before the FN composite existed;
# 2.7 retired the CE and TS datatypes for CWE/DTM). hl7apy supports
# versions 2.2-2.8.x only — a 2.1 message (the corpus's lab03.txt)
# raises UnsupportedVersion inside parse_message, which the reference
# routes to the error zone, so strict mode here dead-letters it too.
#
# The tables above remain the v2.5(.1) BASE; _VERSION_DELTAS vendors
# the per-version grammar facts (public HL7 v2.x standards / hl7apy
# grammar tables) for the versions the reference corpus declares:
# 2.3 (lab01/lab02), 2.3.1 (adt03_AthenaHealth), 2.7 (adt02), and a
# lenient-only 2.1 shaping (lab03 — the reference itself cannot parse
# 2.1; lenient mode falls back to flat union attachment with 2.1
# datatypes so no data is lost). Versions without a vendored delta
# (2.2/2.4/2.5.1/2.6/2.8.x and anything unknown) resolve to the 2.5
# base, the documented fallback.

# hl7apy's supported-version set (UnsupportedVersion otherwise) — the
# strict-mode gate (parse_er7_lambda.py:10 raises before any grammar
# walk for versions outside this set; trigger_lambda.py dead-letters).
SUPPORTED_VERSIONS: frozenset[str] = frozenset(
    {"2.2", "2.3", "2.3.1", "2.4", "2.5", "2.5.1", "2.6", "2.7",
     "2.8", "2.8.1", "2.8.2"}
)


def _adt_flat(structure: str, *, merge: bool = False,
              patient_group: bool = False) -> tuple:
    """Pre-2.4 ADT structure trees: each trigger owns a structure (the
    MSH-9.3 consolidation arrived later), bodies are the A01 shape
    minus the segments the version lacks (SFT is 2.5+), and group
    wrappers carry the OWNING structure's prefix (hl7apy names groups
    per structure: ADT_A31_INSURANCE, not ADT_A05_INSURANCE)."""
    if merge and patient_group:
        return (
            _S("MSH", 1), _S("EVN", 1),
            (f"{structure}_PATIENT", None,
             (_S("PID", 1), _S("PD1", 1), _S("MRG", 1), _S("PV1", 1))),
        )
    if merge:
        return (_S("MSH", 1), _S("EVN", 1), _S("PID", 1), _S("PD1", 1),
                _S("MRG", 1))
    return (
        _S("MSH", 1), _S("EVN", 1), _S("PID", 1), _S("PD1", 1),
        _S("NK1", None), _S("PV1", 1), _S("PV2", 1), _S("DB1", None),
        _S("OBX", None), _S("AL1", None), _S("DG1", None), _S("DRG", 1),
        (f"{structure}_PROCEDURE", None, (_S("PR1", 1), _S("ROL", None))),
        _S("GT1", None),
        (f"{structure}_INSURANCE", None,
         (_S("IN1", 1), _S("IN2", 1), _S("IN3", 1))),
        _S("ACC", 1), _S("UB1", 1), _S("UB2", 1),
    )


# ORU_R01 before 2.4: hl7apy spells the outer repeating group
# ORU_R01_RESPONSE (renamed PATIENT_RESULT in 2.5); no TQ1/TQ2, no
# SPM/SPECIMEN, no CTD, no FT1 — those segments postdate the version.
_ORU_R01_TREE_23 = (
    _S("MSH", 1),
    ("ORU_R01_RESPONSE", None, (
        ("ORU_R01_PATIENT", 1, (
            _S("PID", 1), _S("PD1", 1), _S("NK1", None), _S("NTE", None),
            ("ORU_R01_VISIT", 1, (_S("PV1", 1), _S("PV2", 1))),
        )),
        ("ORU_R01_ORDER_OBSERVATION", None, (
            _S("ORC", 1), _S("OBR", 1), _S("NTE", None),
            ("ORU_R01_OBSERVATION", None, (_S("OBX", 1), _S("NTE", None))),
            _S("CTI", None),
        )),
    )),
    _S("DSC", 1),
)

# Per-trigger ADT event->structure rows shared by the 2.3/2.3.1 deltas
# (corpus-exercised triggers; others fall back to the union table).
_PRE24_ADT_EVENTS = {
    "ADT_A01": "ADT_A01", "ADT_A02": "ADT_A02", "ADT_A04": "ADT_A04",
    "ADT_A08": "ADT_A08", "ADT_A05": "ADT_A05", "ADT_A28": "ADT_A28",
    "ADT_A31": "ADT_A31", "ADT_A34": "ADT_A34", "ADT_A40": "ADT_A40",
}

_PRE24_ADT_TREES = {
    "ADT_A01": _adt_flat("ADT_A01"),
    "ADT_A02": (_S("MSH", 1), _S("EVN", 1), _S("PID", 1), _S("PD1", 1),
                _S("PV1", 1), _S("PV2", 1), _S("DB1", None),
                _S("OBX", None)),
    "ADT_A04": _adt_flat("ADT_A04"),
    "ADT_A08": _adt_flat("ADT_A08"),
    "ADT_A05": _adt_flat("ADT_A05"),
    "ADT_A28": _adt_flat("ADT_A28"),
    "ADT_A31": _adt_flat("ADT_A31"),
    "ADT_A34": _adt_flat("ADT_A34", merge=True),
    "ADT_A40": _adt_flat("ADT_A40", merge=True, patient_group=True),
    "ORU_R01": _ORU_R01_TREE_23,
}

# Datatype facts shared by 2.3 and 2.3.1: the FN and SAD composites do
# not exist yet (XPN-1 / XCN-2 family names and XAD-1 street address
# are plain ST leaves), MSH-9 is the CM_MSG compound, ERR carries only
# its repeatable ELD field, and PID-10 race / PID-22 ethnic group are
# single-valued (repeatability arrived in 2.4).
_PRE24_COMPONENT_DT = {
    "XPN": {1: "ST"},
    "XCN": {2: "ST"},
    "XAD": {1: "ST"},
    "CM_MSG": {1: "ID", 2: "ID", 3: "ID"},
}
_PRE24_FIELD_REP = {
    # PID-5 gains a 2.4+ repetition only for 10/22; the rest of the
    # base PID set (3/5/13/14/...) already repeats in 2.3/2.3.1
    "PID": frozenset({3, 4, 5, 6, 9, 11, 13, 14, 21, 26}),
    "ERR": frozenset({1}),
}

_VERSION_DELTAS: dict[str, dict] = {
    "2.3": {
        # QPD/QAK/RCP arrived with the v2.4 query framework (pre-2.4
        # queries were QRY/QRD-based) — remove them so a 2.3-declared
        # QBP dead-letters in strict mode exactly as hl7apy would
        "segments_remove": {"SFT", "TQ1", "TQ2", "SPM", "PDA",
                            "QPD", "QAK", "RCP"},
        "field_datatype": {
            "MSH": {9: "CM_MSG", 12: "ID", 21: None},
            "PID": {10: "IS", 22: "IS", 26: "IS"},
            "ERR": {1: "ELD", 2: None, 3: None, 4: None, 5: None},
        },
        "field_repeatable": _PRE24_FIELD_REP,
        "component_datatype": _PRE24_COMPONENT_DT,
        "event_structure": _PRE24_ADT_EVENTS,
        "structure_trees": _PRE24_ADT_TREES,
    },
    "2.3.1": {
        "segments_remove": {"SFT", "TQ1", "TQ2", "SPM",
                            "QPD", "QAK", "RCP"},
        "field_datatype": {
            # 2.3.1 introduced the VID version id and MSH-9.3; race and
            # ethnic group became coded CEs (still single-valued)
            "MSH": {9: "CM_MSG", 21: None},
            "PID": {10: "CE", 22: "CE", 26: "CE"},
            "ERR": {1: "ELD", 2: None, 3: None, 4: None, 5: None},
        },
        "field_repeatable": _PRE24_FIELD_REP,
        "component_datatype": _PRE24_COMPONENT_DT,
        "event_structure": _PRE24_ADT_EVENTS,
        "structure_trees": _PRE24_ADT_TREES,
    },
    "2.7": {
        # v2.7 WITHDREW the CE and TS datatypes (CWE and DTM replace
        # them) and promoted several IS code fields to CWE. DTM is a
        # PRIMITIVE: a 2.7 timestamp field is a leaf string where 2.5
        # wrapped it in a one-key {TS_1: ...} composite dict.
        "field_datatype": {
            "MSH": {7: "DTM"},
            "EVN": {2: "DTM", 3: "DTM", 6: "DTM"},
            "PID": {7: "DTM", 8: "CWE", 10: "CWE", 15: "CWE", 16: "CWE",
                    17: "CWE", 22: "CWE", 26: "CWE", 32: "CWE"},
            "NK1": {3: "CWE", 7: "CWE"},
            "PV1": {2: "CWE", 4: "CWE", 10: "CWE", 14: "CWE", 18: "CWE",
                    36: "CWE", 39: "CWE", 44: "DTM", 45: "DTM"},
            "OBX": {3: "CWE", 6: "CWE", 8: "CWE", 14: "DTM", 15: "CWE",
                    17: "CWE", 19: "DTM"},
            "OBR": {4: "CWE", 7: "DTM", 8: "DTM", 14: "DTM", 22: "DTM",
                    25: "ID"},
            "NTE": {2: "ID"},
            "DG1": {3: "CWE", 5: "DTM", 6: "CWE"},
            "AL1": {2: "CWE", 3: "CWE", 4: "CWE"},
            "GT1": {8: "DTM"},
            "IN1": {2: "CWE"},
            "ACC": {1: "DTM", 2: "CWE"},
        },
        "component_datatype": {
            # TS no longer exists; the DR range is a pair of DTMs
            "DR": {1: "DTM", 2: "DTM"},
            "XPN": {10: "ST", 12: "DTM", 13: "DTM"},
            "XCN": {19: "DTM", 20: "DTM"},
            "XAD": {12: "ST", 13: "DTM", 14: "DTM"},
            "CX": {9: "CWE", 10: "CWE"},
            "CCD": {2: "DTM"},
        },
    },
    # 2.1 is OUTSIDE hl7apy's supported set: the reference's parse
    # raises UnsupportedVersion and dead-letters the message, so strict
    # mode returns None (see SUPPORTED_VERSIONS). This delta shapes the
    # LENIENT path only: 2.1 datatypes (PN names, CK/CN identifiers,
    # no XPN/XCN/CX composites) over flat union attachment — there is
    # no hl7apy 2.1 grammar to mirror, so no structure trees apply.
    "2.1": {
        "structure_trees_clear": True,
        "field_datatype": {
            "MSH": {9: "CM_MSG", 12: "ID", 18: None, 21: None},
            "PID": {2: "CK", 3: "CK", 4: "ST", 5: "PN", 6: "PN",
                    9: "PN", 10: "ID", 11: "AD", 13: "TN", 14: "TN",
                    15: "ST", 16: "ID", 17: "ID", 18: "CK", 21: None,
                    22: None, 26: None, 32: None},
            "OBR": {2: "CM", 3: "CM", 4: "CE", 16: "CN", 28: "CN"},
            "OBX": {3: "CE", 16: "CN", 17: None, 18: None},
            "EVN": {5: None, 6: None},
        },
        "field_repeatable": {
            "MSH": frozenset(), "PID": frozenset({11}),
            "EVN": frozenset(), "OBR": frozenset(),
            "OBX": frozenset({5}), "NTE": frozenset({3}),
        },
        "component_datatype": {
            "PN": {1: "ST", 2: "ST", 3: "ST", 4: "ST", 5: "ST", 6: "ST"},
            "CK": {1: "NM", 2: "NM", 3: "ID"},
            "CN": {1: "ID", 2: "ST", 3: "ST", 4: "ST", 5: "ST", 6: "ST"},
            "AD": {1: "ST", 2: "ST", 3: "ST", 4: "ST", 5: "ST", 6: "ID"},
            "CM_MSG": {1: "ID", 2: "ID"},
        },
    },
}


def _prune_tree(tree: tuple, removed: set[str]) -> tuple:
    """Drop segment nodes whose id the version lacks (and any group
    left empty), so e.g. a 2.3.1 walk never opens a TIMING group whose
    TQ1 member postdates the version."""
    out = []
    for node in tree:
        name, card, kids = node
        if kids is None:
            if name not in removed:
                out.append(node)
        else:
            pruned = _prune_tree(kids, removed)
            if pruned:
                out.append((name, card, pruned))
    return tuple(out)


def _flatten_tree(tree: tuple, out: dict | None = None) -> dict:
    """Flat seg->max-card view of a tree (cardinality WITHIN the
    immediate parent, like STRUCTURE_SEGMENT_CARDINALITY); first
    occurrence wins, matching the greedy walk's attachment order."""
    if out is None:
        out = {}
    for name, card, kids in tree:
        if kids is None:
            out.setdefault(name, card)
        else:
            _flatten_tree(kids, out)
    return out


class Grammar:
    """One version's resolved grammar view. The module-level functions
    below remain the v2.5 base view for existing callers; the parser
    threads an instance of this through every shape decision."""

    __slots__ = ("version", "seg_card", "field_rep", "field_dt",
                 "comp_dt", "event_structure", "struct_card", "trees")

    def __init__(self, version, seg_card, field_rep, field_dt, comp_dt,
                 event_structure, struct_card, trees):
        self.version = version
        self.seg_card = seg_card
        self.field_rep = field_rep
        self.field_dt = field_dt
        self.comp_dt = comp_dt
        self.event_structure = event_structure
        self.struct_card = struct_card
        self.trees = trees

    def is_known(self, seg_id: str) -> bool:
        return seg_id in self.seg_card

    def field_repeats(self, seg_id: str, field_num: int) -> bool:
        return field_num in self.field_rep.get(seg_id, _EMPTY)

    def field_datatype(self, seg_id: str, field_num: int) -> str | None:
        return self.field_dt.get(seg_id, _EMPTY_DT).get(field_num)

    def component_datatype(self, dt: str | None, comp_num: int) -> str | None:
        if dt is None:
            return None
        return self.comp_dt.get(dt, _EMPTY_DT).get(comp_num)

    def structure_for(self, message_type: str, trigger: str,
                      explicit: str | None) -> str | None:
        if explicit:
            return explicit if explicit in self.struct_card else None
        if message_type == "ACK" and "ACK" in self.trees:
            return "ACK"
        return self.event_structure.get(f"{message_type}_{trigger}")

    def structure_tree(self, structure: str | None) -> tuple | None:
        if structure is None:
            return None
        return self.trees.get(structure)

    def is_repeatable(self, seg_id: str, structure: str | None = None) -> bool:
        if structure is not None:
            per = self.struct_card.get(structure)
            if per is not None and seg_id in per:
                return per[seg_id] is None
        return self.seg_card.get(seg_id, None) is None


def _build_grammar(version: str | None) -> Grammar:
    delta = _VERSION_DELTAS.get(version or "")
    if delta is None:
        return _BASE_GRAMMAR
    removed = set(delta.get("segments_remove", ()))
    seg_card = {k: v for k, v in SEGMENT_CARDINALITY.items()
                if k not in removed}
    field_rep = dict(FIELD_REPEATABLE)
    field_rep.update(delta.get("field_repeatable", {}))
    field_dt = {k: dict(v) for k, v in FIELD_DATATYPE.items()}
    for seg, over in delta.get("field_datatype", {}).items():
        d = field_dt.setdefault(seg, {})
        for n, dt in over.items():
            if dt is None:
                d.pop(n, None)
            else:
                d[n] = dt
    comp_dt = {k: dict(v) for k, v in COMPONENT_DATATYPE.items()}
    for name, over in delta.get("component_datatype", {}).items():
        comp_dt.setdefault(name, {}).update(over)
    if delta.get("structure_trees_clear"):
        trees: dict[str, tuple] = {}
        event_structure: dict[str, str] = {}
    else:
        trees = dict(STRUCTURE_TREES)
        trees.update(delta.get("structure_trees", {}))
        trees = {k: _prune_tree(v, removed) for k, v in trees.items()}
        event_structure = dict(EVENT_STRUCTURE)
        event_structure.update(delta.get("event_structure", {}))
    struct_card = dict(STRUCTURE_SEGMENT_CARDINALITY)
    for name, tree in trees.items():
        if name not in STRUCTURE_SEGMENT_CARDINALITY or name in delta.get(
            "structure_trees", {}
        ):
            struct_card[name] = _flatten_tree(tree)
    if delta.get("structure_trees_clear"):
        struct_card = {}
    return Grammar(version, seg_card, field_rep, field_dt, comp_dt,
                   event_structure, struct_card, trees)


_BASE_GRAMMAR = Grammar(
    "2.5", SEGMENT_CARDINALITY, FIELD_REPEATABLE, FIELD_DATATYPE,
    COMPONENT_DATATYPE, EVENT_STRUCTURE, STRUCTURE_SEGMENT_CARDINALITY,
    STRUCTURE_TREES,
)

_GRAMMAR_CACHE: dict[str, Grammar] = {}


def grammar_for(version: str | None) -> Grammar:
    """The resolved grammar view for a declared MSH-12 version: a
    vendored delta where one exists (2.1/2.3/2.3.1/2.7), the 2.5 base
    otherwise (including None — hl7apy's own default resolution reads
    MSH-12, and messages without one fail strict mode upstream)."""
    key = version or ""
    g = _GRAMMAR_CACHE.get(key)
    if g is None:
        g = _GRAMMAR_CACHE[key] = _build_grammar(version)
    return g
