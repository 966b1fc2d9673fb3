"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a `kind` tag and
per-kind metadata extracted by Arrow-batched `mapInPandas` kernels.
The decode stage is REAL for every kind: image dimensions come from
actual PNG/JPEG/GIF/BMP headers, audio rate/samples from RIFF/WAVE
headers, and video duration/timescale/dimensions from an actual ISO
BMFF (MP4) box walk (pipeline.media decode_mp4 — the demuxer's probe
step; per-frame pixel decode would plug into the same mapInPandas
kernel via pyav when available).

Scale notes: binary payloads ride in their own parquet column (no
row-group bloat for metadata-only scans thanks to column pruning);
payload-heavy stages should set spark.sql.files.maxPartitionBytes low
enough that a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_spark.pipeline.media import (
    decode_image,
    decode_mp4,
    decode_wav,
    jpeg_bytes,
    mp4_bytes,
    png_bytes,
    wav_bytes,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_frames", LongType()),
        StructField("sha256", StringType()),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize binary payloads with REAL container headers from the
    text rows (the test/gate stand-in for media bytes arriving from an
    object store): images get PNG (doc_id % 6 == 0) or JPEG headers
    with dimensions derived from doc_id, audio gets a canonical WAV
    header, video a minimal ISO BMFF (MP4) container whose mdat holds
    the text bytes. Sizes are closed-form — header + utf8(text) — so
    a SQL oracle can re-derive every decoded field."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "kind": [], "payload": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                tail = str(text).encode("utf-8")
                k = did % 3
                if k == 0:
                    kind = "image"
                    w, h = did % 640 + 1, did % 480 + 1
                    payload = (
                        png_bytes(w, h, tail) if did % 6 == 0 else jpeg_bytes(w, h, tail)
                    )
                elif k == 1:
                    kind = "audio"
                    payload = wav_bytes(8000 + (did % 8) * 1000, tail)
                else:
                    kind = "video"
                    payload = mp4_bytes(
                        did % 1920 + 16, did % 1080 + 16, did % 240 + 24, tail
                    )
                out["doc_id"].append(did)
                out["kind"].append(kind)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        _mk, schema=schema
    )


def extract_metadata(payloads: DataFrame) -> DataFrame:
    """(doc_id, kind, payload) → typed metadata via mapInPandas with
    REAL header decode: PNG/JPEG/GIF/BMP dimensions, WAV sample rate +
    sample count (pipeline.media). Unrecognized payloads get format
    NULL and zeroed fields; video decodes duration (in timescale
    ticks; the synthesis writes 24 fps so ticks == frames) and the
    track's presentation dimensions from the real MP4 box walk."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k.name: [] for k in META_SCHEMA.fields}
            for did, kind, payload in zip(pdf["doc_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                fmt, w, h, rate, frames = None, 0, 0, 0, 0
                if kind == "image":
                    got = decode_image(b)
                    if got is not None:
                        fmt, w, h = got
                        frames = 1
                elif kind == "audio":
                    got = decode_wav(b)
                    if got is not None:
                        rate, _ch, _bits, n_samples = got
                        fmt, frames = "wav", n_samples
                else:
                    got = decode_mp4(b)
                    if got is not None:
                        _ts, duration, w, h = got
                        fmt, frames = "mp4", duration
                out["doc_id"].append(int(did))
                out["kind"].append(kind)
                out["format"].append(fmt)
                out["n_bytes"].append(len(b))
                out["width"].append(w)
                out["height"].append(h)
                out["sample_rate"].append(rate)
                out["n_frames"].append(frames)
                out["sha256"].append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame(out)

    return payloads.mapInPandas(_extract, schema=META_SCHEMA)


def frame_sample(payloads: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (doc_id,
    frame_idx, frame_bytes) rows for every ``every_n``-th frame. The
    frame COUNT comes from the real MP4 header (mvhd duration; the
    synthesis writes ticks == frames); the emitted bytes slice the
    mdat payload deterministically — a codec would emit decoded frames
    from the same positions. Demonstrates the 1→N mapInPandas fan-out
    shape used for frame-level training data."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                b = bytes(r["payload"])
                got = decode_mp4(b)
                if got is None:
                    continue
                _ts, n_frames, _w, _h = got
                for i in range(0, n_frames, every_n):
                    lo = (i * 37) % max(len(b) - 8, 1)
                    rows["doc_id"].append(r["doc_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(b[lo : lo + 8])
            yield pd.DataFrame(rows)

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )
    return payloads.mapInPandas(_sample, schema=schema)
