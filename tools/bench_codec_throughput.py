"""Codec-tier throughput budget (r12, VERDICT r11 ask #7).

Measures the Arrow-batched decode path's MB/s per core for each real
codec (WAV, BMP, PNG RGB, palette PNG, baseline / progressive / 4:2:0
color JPEG) at realistic payload sizes, then extrapolates what
fraction of a 100 TB multimodal scan's wall-clock the codec tier
would own on a production cluster. The number decides whether a codec
needs a vectorized fast path or can stay per-payload Python inside
mapInPandas (SCALE.md records the verdict).

Protocol: payloads are synthesized ONCE (doc_id-deterministic,
executor-parallel) and written to a local parquet so the timed pass
pays only scan + decode; a scan-only pass (sum of octet_length over
the same parquet) is timed separately and subtracted, so the
reported net MB/s is the decode kernel itself. Each timed pass runs
REPS times; the minimum wall is used (same convention as bench.py).

    python tools/bench_codec_throughput.py [--rows=3000] [--side=128]
        [--reps=3] [--json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 3000
SIDE = 128          # image edge px
WAV_SECS = 2.0      # seconds of 16-bit mono PCM @ 8 kHz
REPS = 3
WORK = "/tmp/codec_bench"


def _synth_pandas(fmt: str, side: int):
    """Return a mapInPandas fn synthesizing one payload per doc_id."""
    import numpy as np
    import pandas as pd

    from hcls_data_lake_spark.operators import multimodal as mm

    def run(batches):
        for pdf in batches:
            payloads = []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                rng = np.random.RandomState(doc_id % (2**31))
                if fmt == "wav":
                    n = int(WAV_SECS * 8000)
                    pcm = rng.randint(-2**15, 2**15, size=n) \
                        .astype("<i2").tobytes()
                    payloads.append(mm.encode_wav(pcm))
                elif fmt == "bmp":
                    px = rng.randint(0, 256, size=side * side * 3,
                                     dtype=np.uint8).tobytes()
                    payloads.append(mm.encode_bmp(side, side, px))
                elif fmt == "png":
                    px = rng.randint(0, 256, size=side * side * 3,
                                     dtype=np.uint8).tobytes()
                    filters = [int(f) for f in
                               rng.randint(0, 5, size=side)]
                    payloads.append(mm.encode_png(side, side, px, filters))
                elif fmt == "png_palette":
                    plte = rng.randint(0, 256, size=3 * 256,
                                       dtype=np.uint8).tobytes()
                    idx = rng.randint(0, 256, size=side * side) \
                        .astype(np.uint8).tobytes()
                    filters = [int(f) for f in
                               rng.randint(0, 5, size=side)]
                    payloads.append(
                        mm.encode_png_palette(side, side, idx, plte,
                                              filters))
                elif fmt == "jpeg":
                    px = rng.randint(0, 256, size=(side, side),
                                     dtype=np.uint8)
                    payloads.append(
                        mm.encode_jpeg(side, side, px.tobytes()))
                elif fmt == "jpeg_progressive":
                    px = rng.randint(0, 256, size=(side, side),
                                     dtype=np.uint8)
                    payloads.append(mm.encode_jpeg_progressive(
                        side, side, px.tobytes()))
                elif fmt == "jpeg_color420":
                    px = rng.randint(0, 256, size=(side, side, 3),
                                     dtype=np.uint8)
                    payloads.append(mm.encode_jpeg_color(
                        side, side, px.tobytes(), subsample="420"))
                else:
                    raise ValueError(fmt)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads})

    return run


_MIME = {
    "wav": "audio/wav",
    "bmp": "image/bmp",
    "png": "image/png",
    "png_palette": "image/png",
    "jpeg": "image/jpeg",
    "jpeg_progressive": "image/jpeg",
    "jpeg_color420": "image/jpeg",
}

# Decoded output bytes per payload (the codec tier's useful work unit):
# raw pixels / PCM. Used for the decoded-MB/s column.


def main() -> None:
    rows, side, reps, as_json = ROWS, SIDE, REPS, False
    formats = ("wav", "bmp", "png", "png_palette", "jpeg",
               "jpeg_progressive", "jpeg_color420")
    for arg in sys.argv[1:]:
        if arg.startswith("--rows="):
            rows = int(arg.split("=")[1])
        elif arg.startswith("--side="):
            side = int(arg.split("=")[1])
        elif arg.startswith("--reps="):
            reps = int(arg.split("=")[1])
        elif arg.startswith("--formats="):
            formats = tuple(arg.split("=")[1].split(","))
        elif arg == "--json":
            as_json = True

    from pyspark.sql import functions as F

    from hcls_data_lake_spark.operators.multimodal import media_properties
    from hcls_data_lake_spark.session import get_spark

    spark = get_spark("codec-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    cores = int(spark.sparkContext.defaultParallelism)
    os.makedirs(WORK, exist_ok=True)

    results = {}
    for fmt in formats:
        path = os.path.join(WORK, f"{fmt}_{rows}_{side}.parquet")
        if not os.path.exists(path):
            base = spark.range(rows).select(
                F.col("id").alias("doc_id"))
            base.repartition(cores).mapInPandas(
                _synth_pandas(fmt, side),
                schema="doc_id bigint, payload binary",
            ).write.mode("overwrite").parquet(path)

        src = spark.read.parquet(path).withColumn(
            "mime_type", F.lit(_MIME[fmt]))
        total_bytes = src.agg(
            F.sum(F.octet_length("payload"))).collect()[0][0]

        # scan-only floor: same parquet, JVM-side byte-sum, no decode
        t_scan = min(
            _timed(lambda: src.agg(
                F.sum(F.octet_length("payload"))).collect())
            for _ in range(reps))
        # decode pass: media_properties -> aggregate the scalar rows
        t_dec = min(
            _timed(lambda: media_properties(src).agg(
                F.sum("pixel_byte_sum"), F.sum("pcm_byte_sum"),
                F.sum(F.when(F.col("parse_ok"), 1).otherwise(0)),
            ).collect())
            for _ in range(reps))
        net = max(t_dec - t_scan, 1e-9)
        mb = total_bytes / 1e6
        results[fmt] = {
            "rows": rows,
            "payload_mb": round(mb, 1),
            "scan_s": round(t_scan, 3),
            "decode_s": round(t_dec, 3),
            "net_s": round(net, 3),
            "mb_s_total": round(mb / net, 1),
            "mb_s_core": round(mb / net / cores, 3),
        }
        print(f"{fmt:18s} {mb:8.1f} MB  scan {t_scan:6.2f}s  "
              f"decode {t_dec:7.2f}s  net {net:7.2f}s  "
              f"-> {mb/net:8.1f} MB/s ({mb/net/cores:7.3f} MB/s/core)",
              flush=True)

    if as_json:
        print(json.dumps({"cores": cores, "side": side,
                          "results": results}))
    spark.stop()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
