"""Multimodal column plumbing (BASELINE.json north star): image/audio/
video as opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are
STUBS (clearly marked): a deterministic fake decoder driven by the
payload bytes, and a strict variant raising ``NotImplementedError``.
Everything around them — schema, partitioning, UDF signatures, batch
shapes — is real Spark plumbing and is tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "BLOB_SCHEMA",
    "attach_blob",
    "blob_stats",
    "decode_image_stub",
    "fake_decode_features",
    "frame_sample",
    "resize_stub",
]

# media row: opaque payload + typed metadata (what a 100 TB multimodal
# lakehouse table looks like: parquet binary column + struct metadata)
BLOB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)


def attach_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal table from documents: payload = utf-8 bytes
    (stand-in for image/audio bytes), metadata struct alongside."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def blob_stats(blobs: DataFrame) -> DataFrame:
    """Pure-expression stats over binary payloads (no Python): byte
    length, md5 of the bytes, first byte value."""
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.length("payload").alias("payload_len"),
    )


def decode_image_stub(blobs: DataFrame) -> DataFrame:
    """STRICT STUB: the real decode (PIL/ffmpeg) is unavailable in this
    environment.  Raises NotImplementedError per batch — the plumbing
    (schema, mapInPandas signature) is what this validates."""
    out_schema = "doc_id long, width int, height int"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _ in batches:
            raise NotImplementedError(
                "image decode requires PIL/libvips — not present in this container"
            )

    return blobs.mapInPandas(decode, schema=out_schema)


def fake_decode_features(blobs: DataFrame, *, dim: int = 8) -> DataFrame:
    """Deterministic fake 'decoder': derives a pseudo feature vector
    from payload bytes (byte-histogram moments).  Stands in for
    image-embedding extraction with the REAL batch shape: Arrow batches
    in, (doc_id, array<double>) out, partition-parallel."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                # deterministic, dependency-free "features"
                feats.append(
                    [
                        float(sum(b[i::dim]) % 997) / 997.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return blobs.mapInPandas(extract, schema=out_schema)


def resize_stub(
    blobs: DataFrame, *, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """Deterministic fake 'image resize': treat the payload as a 1-D
    pixel buffer and nearest-neighbor-sample it down to
    ``target_w × target_h`` bytes.  The REAL resize (PIL/libvips) slots
    into the same ``mapInPandas`` stage with the same contract: Arrow
    batches in, fixed-size pixel buffer + dims out, partition-parallel,
    no shuffle.  Deterministic in the payload bytes so tests can pin
    outputs."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )
    n_out = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for payload in pdf["payload"]:
                b = bytes(payload) or b"\x00"
                # nearest-neighbor index map from n_out to len(b)
                pixels.append(
                    bytes(b[(i * len(b)) // n_out] for i in range(n_out))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": target_w,
                    "out_h": target_h,
                    "pixels": pixels,
                }
            )

    return blobs.mapInPandas(resize, schema=out_schema)


def frame_sample(blobs: DataFrame, *, stride: int = 16, frame_len: int = 4) -> DataFrame:
    """'Video frame sampling' stand-in: slice the payload at a byte
    stride into fixed-length frames (explode — one row per frame).
    Pure expressions; shows the fan-out shape of frame extraction."""
    n = F.octet_length("payload")
    idx = F.sequence(F.lit(0), F.greatest((n - frame_len) / stride, F.lit(0)).cast("int"))
    frames = F.transform(
        idx, lambda i: F.substring(F.col("payload"), (i * stride + 1).cast("int"), frame_len)
    )
    return (
        blobs.select("doc_id", F.posexplode(frames).alias("frame_idx", "frame"))
        .select("doc_id", "frame_idx", F.md5("frame").alias("frame_md5"))
    )
