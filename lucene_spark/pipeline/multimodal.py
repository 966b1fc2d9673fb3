"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a `kind` tag and
per-kind metadata extracted by Arrow-batched `mapInPandas` kernels.
The Spark-side contract — schema, batching, partition sizing — is real
and tested; the actual media decode is STUBBED (this container has no
image/audio libraries): `decode_stub=True` (default) derives
deterministic pseudo-metadata from the bytes, and `decode_stub=False`
raises NotImplementedError at the exact point a real decoder (PIL /
torchaudio / pyav inside the same mapInPandas kernel) would plug in.

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

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("sha256", StringType()),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column from text (UTF-8
    encode) + a deterministic kind tag — the test stand-in for real
    media bytes arriving from an object store."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col(id_col) % 3 + 1).cast("int")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
    )


def extract_metadata(payloads: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(doc_id, kind, payload) → typed metadata via mapInPandas.

    Stub decode derives (width, height, n_frames) deterministically
    from the byte length; a real decoder replaces `_stub_decode` only —
    the Spark plumbing (Arrow batches of binary, schema, partitioning)
    is identical.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/pyav/torchaudio — plug in here"
                )
            n = pdf["payload"].map(len)
            kinds = pdf["kind"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": kinds,
                    "n_bytes": n.astype("int64"),
                    "width": (n % 640 + 1).where(kinds == "image", 0).astype("int64"),
                    "height": (n % 480 + 1).where(kinds == "image", 0).astype("int64"),
                    "n_frames": (n % 24 + 1).where(kinds != "image", 1).astype("int64"),
                    "sha256": pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                }
            )

    return payloads.mapInPandas(_extract, schema=META_SCHEMA)


def frame_sample(payloads: DataFrame, every_n: int = 8) -> DataFrame:
    """Deterministic frame sampling plumbing for video payloads: emits
    (doc_id, frame_idx, frame_bytes) rows — the stub slices the payload
    bytes; a real decoder would emit encoded frames. Demonstrates the
    1→N mapInPandas fan-out shape used for frame-level training data."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                b = bytes(r["payload"])
                n_frames = len(b) % 24 + 1
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
