"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design for image/audio/video at 100 TB: media rides as an opaque
``BinaryType`` column (or an object-store URI for payloads beyond the
row-group sweet spot) next to a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so bytes cross the JVM↔Python boundary
once per batch, never per row.

The actual codec step is STUBBED in this container (no PIL/ffmpeg/
soundfile): :func:`decode_media` dispatches on the container's magic
bytes and produces a deterministic fake decode (real header parsing,
fake pixel/sample payload) — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested, and
swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "DECODED_SCHEMA",
    "attach_media_meta",
    "decode_media",
    "byte_features",
]

#: typed metadata carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video|unknown
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),  # md5 hex of payload
    ]
)

#: decode output schema (fixed regardless of codec)
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

_MAGIC = {
    b"\x89PNG": ("image", 8),
    b"\xff\xd8\xff": ("image", 2),
    b"RIFF": ("audio", 12),
    b"\x00\x00\x00\x18ftyp": ("video", 16),
}


def attach_media_meta(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Attach the typed metadata struct for a binary payload column —
    pure JVM expressions (no decode), so it runs at scan speed and the
    metadata can be written back as a real table column for pruning."""
    p = F.col(payload_col)
    media_type = (
        F.when(
            F.startswith(p, F.lit(b"\x89PNG")) | F.startswith(p, F.lit(b"\xff\xd8\xff")),
            F.lit("image"),
        )
        .when(F.startswith(p, F.lit(b"RIFF")), F.lit("audio"))
        .when(
            F.startswith(F.substring(p, 5, 4), F.lit(b"ftyp")), F.lit("video")
        )
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"),
            F.octet_length(p).cast("long").alias("byte_len"),
            F.md5(p).alias("digest"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for the codec: classify by magic bytes and
    derive (width, height, n_frames) from the payload digest.  Real codec
    integration replaces ONLY this function.

    Raises ``NotImplementedError`` for genuinely unknown containers when
    ``strict`` decoding is requested by the caller.
    """
    mt = "unknown"
    for magic, (kind, _hdr) in _MAGIC.items():
        if payload.startswith(magic):
            mt = kind
            break
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    n_frames = 1 if mt == "image" else 1 + h[2] % 30
    return mt, width, height, n_frames


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    feature_dim: int = 8,
    strict: bool = False,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode + feature-extract binary payloads via ``mapInPandas``.

    One Arrow batch in, one out; the per-batch loop is over *payloads in
    a batch* (unavoidable for codecs), not a Python-per-row UDF call.
    Output schema is :data:`DECODED_SCHEMA`.  ``strict=True`` raises
    ``NotImplementedError`` on unknown containers (the stub marker);
    otherwise they pass through as ``media_type='unknown'``.

    Scale notes: decode is CPU-bound and embarrassingly parallel — size
    partitions by payload bytes (``spark.sql.files.maxPartitionBytes``),
    and ``repartition`` beforehand if payload sizes are skewed so one
    task doesn't hold the long tail of 4K videos.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                mt, w, hgt, nf = _fake_decode(payload)
                if mt == "unknown" and strict:
                    raise NotImplementedError(
                        "no codec available in this environment for "
                        "unknown container (stubbed decode)"
                    )
                dig = hashlib.md5(payload).digest()
                feature = [
                    dig[i % len(dig)] / 255.0 for i in range(feature_dim)
                ]
                rows.append((int(rid), mt, w, hgt, nf, feature))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(run, DECODED_SCHEMA)


def byte_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "id", bins: int = 16
) -> DataFrame:
    """Coarse byte-histogram features for a binary column, as one
    vectorized pandas pass (``mapInPandas``): ``(id, byte_len,
    histogram: array<double>)`` with ``bins`` equal-width byte-value
    bins, L1-normalised.  Useful as a cheap near-dup / corruption signal
    on media payloads without any codec."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("byte_len", T.LongType()),
            T.StructField("histogram", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    out.append((int(rid), 0, [0.0] * bins))
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                total = max(int(hist.sum()), 1)
                out.append(
                    (int(rid), int(arr.size), (hist / total).tolist())
                )
            yield pd.DataFrame(out, columns=["id", "byte_len", "histogram"])

    return df.select(id_col, payload_col).mapInPandas(run, schema)
