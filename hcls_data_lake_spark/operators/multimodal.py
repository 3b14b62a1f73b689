"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md north star): image/audio/video are ``binary`` columns
travelling beside typed metadata; decode / feature-extract run as
Arrow-batched ``mapInPandas`` so each executor processes whole record
batches without per-row Python overhead. The actual codecs are NOT in
this container, so decode is stubbed behind ``_decode_payload``: real
mime types raise ``NotImplementedError``; ``text/plain`` uses a
deterministic fake "decoder" so the plumbing (schema, batching,
partition-parallelism) is fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id bigint, mime_type string, n_bytes bigint, sha256 string,"
    " feature array<float>, decode_ok boolean"
)

_FAKE_DECODABLE = {"text/plain"}


def _decode_payload(payload: bytes, mime_type: str) -> bytes:
    """Decode stub. Real image/audio decoding needs codecs absent from
    this container; the Spark-side contract (bytes in, bytes out) is
    what matters for the pipeline shape."""
    if mime_type in _FAKE_DECODABLE:
        return payload  # deterministic fake: identity "decode"
    raise NotImplementedError(
        f"no codec for {mime_type}: install decoder and extend _decode_payload"
    )


def _featurize(decoded: bytes) -> list[float]:
    """Deterministic 8-dim feature from byte histogram (stands in for an
    embedding/model forward pass; same Arrow batch shape)."""
    if not decoded:
        return [0.0] * 8
    import numpy as np

    # vectorized: a per-byte Python loop is O(payload) interpreted
    # iterations per row inside the mapInPandas hot path
    arr = np.frombuffer(decoded, dtype=np.uint8)
    hist = np.bincount(arr & 7, minlength=8)
    total = float(arr.size)
    return [round(float(h) / total, 6) for h in hist]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, mime_type,
    meta). Arrow-batched: each pandas batch is processed vectorized in
    one Python call per ~10k rows, not per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "mime_type": pdf["mime_type"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
            }
            feats, oks = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime_type"]):
                try:
                    decoded = _decode_payload(bytes(payload or b""), mime)
                    feats.append(_featurize(decoded))
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            out["feature"] = feats
            out["decode_ok"] = oks
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, mime_type string, payload binary, width int,"
    " height int, resize_ok boolean"
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas image resize over (doc_id, payload, mime_type).

    Real pixel resampling needs an image codec (absent here); the
    deterministic stand-in crops/pads the decoded bytes to width*height
    so output size, schema and batch shape match a real resizer.
    Embarrassingly parallel per partition — no shuffle.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, oks = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime_type"]):
                try:
                    decoded = _decode_payload(bytes(payload or b""), mime)
                    payloads.append(decoded[:target].ljust(target, b"\0"))
                    oks.append(True)
                except NotImplementedError:
                    payloads.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime_type": pdf["mime_type"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "resize_ok": oks,
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, n_frames_total int"


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_nth: int = 4
) -> DataFrame:
    """mapInPandas video frame sampling: ONE input row → MANY frame
    rows (the one-to-many Arrow batch shape a real decoder produces).

    The deterministic stand-in treats the payload as fixed-size chunks
    ("frames") and emits every ``every_nth``-th; a real build swaps the
    chunker for a container demuxer with identical schema/shape.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame": [], "n_frames_total": []
            }
            for doc_id, payload, mime in zip(
                pdf["doc_id"], pdf["payload"], pdf["mime_type"]
            ):
                try:
                    decoded = _decode_payload(bytes(payload or b""), mime)
                except NotImplementedError:
                    continue  # undecodable rows contribute no frames
                n_total = max(1, (len(decoded) + frame_bytes - 1) // frame_bytes)
                for idx in range(0, n_total, every_nth):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(
                        decoded[idx * frame_bytes : (idx + 1) * frame_bytes]
                    )
                    rows["n_frames_total"].append(n_total)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


BYTE_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, first_byte int, last_byte int,"
    " byte_sum bigint"
)


def byte_stats_arrow(df: DataFrame) -> DataFrame:
    """mapInArrow byte statistics over (doc_id, payload) — the zero-copy
    tier below mapInPandas: pyarrow RecordBatches flow straight from the
    JVM with no pandas materialization, so binary payloads are never
    copied into Python objects. Use this tier when the per-batch work
    is arrow/numpy-expressible (stats, slicing, format sniffing) and
    reserve mapInPandas for logic that genuinely needs pandas or a
    model runtime. Same partition-parallel contract: no shuffle, one
    Python worker call per Arrow batch."""
    import numpy as np
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            n = len(batch)
            # TRUE zero-copy: compute every stat from the Arrow value
            # buffer + offsets directly — a per-row `as_py()` would
            # copy each payload into a Python bytes object, exactly
            # the pandas-tier copying this tier exists to avoid
            arr = payloads.combine_chunks() if hasattr(
                payloads, "combine_chunks"
            ) else payloads
            offsets = np.frombuffer(
                arr.buffers()[1], dtype=np.int32, count=n + 1,
                offset=arr.offset * 4,
            ).astype(np.int64)
            data_buf = arr.buffers()[2]
            values = (
                np.frombuffer(data_buf, dtype=np.uint8)
                if data_buf is not None and len(data_buf) > 0
                else np.empty(0, dtype=np.uint8)
            )
            lengths = offsets[1:] - offsets[:-1]
            n_bytes = lengths.astype("int64")
            nonempty = lengths > 0
            first = np.full(n, -1, dtype="int32")
            last = np.full(n, -1, dtype="int32")
            bsum = np.zeros(n, dtype="int64")
            if nonempty.any():
                first[nonempty] = values[offsets[:-1][nonempty]]
                last[nonempty] = values[offsets[1:][nonempty] - 1]
                csum = np.concatenate(
                    ([0], np.cumsum(values, dtype="int64"))
                )
                bsum = csum[offsets[1:]] - csum[offsets[:-1]]
            # null payloads (distinct from empty) report like empty
            if arr.null_count:
                nulls = np.array(
                    [not v for v in arr.is_valid().to_pylist()]
                )
                n_bytes[nulls] = 0
                first[nulls] = -1
                last[nulls] = -1
                bsum[nulls] = 0
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(first, type=pa.int32()),
                    pa.array(last, type=pa.int32()),
                    pa.array(bsum, type=pa.int64()),
                ],
                names=["doc_id", "n_bytes", "first_byte", "last_byte", "byte_sum"],
            )

    return df.mapInArrow(run, schema=BYTE_STATS_SCHEMA)
