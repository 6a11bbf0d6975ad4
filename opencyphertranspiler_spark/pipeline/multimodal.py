"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched Pandas via mapInPandas.

The decode step is STUBBED (image/audio codecs are not available in this
container): ``_decode_payload`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives features
from the raw bytes. Everything around the stub — schema, batch iteration,
partitioning, output contract — is the real 100 TB plumbing:

- payloads stay in ``binary`` columns (Arrow zero-copies them into pandas);
- mapInPandas streams batches (spark.sql.execution.arrow.maxRecordsPerBatch
  bounds memory, independent of partition size);
- feature extraction emits fixed-width arrays, ready for the similarity
  operators in .similarity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo helper: treat each document's utf-8 bytes as an opaque payload
    with image-like metadata. Stands in for reading real image/audio blobs
    from parquet binary columns."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("modality"),
        F.struct(
            (F.length(text_col) % 64 + 1).cast("int").alias("width"),
            (F.length(text_col) % 48 + 1).cast("int").alias("height"),
            F.lit("fake/raw").alias("codec"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes, modality: str, fake: bool) -> list[float]:
    """STUB: real decode would dispatch to PIL/librosa/ffmpeg per modality.

    The deterministic fake derives FEATURE_DIM floats from an md5 of the
    bytes, so tests exercise the full distributed path with stable output."""
    if not fake:
        raise NotImplementedError(
            f"real {modality} decoding requires codec libraries not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    digest = hashlib.md5(payload or b"").digest()
    return [
        round(int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0, 6)
        for i in range(FEATURE_DIM)
    ]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + featurize payloads with Arrow-batched mapInPandas.

    Input columns: doc_id, payload(binary), modality. One output row per
    input row; batches stream through pandas without materializing a
    partition."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": [
                        _decode_payload(p, m, fake)
                        for p, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )

    return df.select("doc_id", "payload", "modality").mapInPandas(
        process, FEATURES_SCHEMA
    )


def sample_frames(
    df: DataFrame, frame_interval: int = 100, max_frames: int = 8
) -> DataFrame:
    """'Video' frame sampling as pure column ops: one output row per sampled
    byte offset. Real frame extraction would replace the slice with a codec
    call inside mapInPandas; the fan-out/row-explosion shape is identical."""
    return df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, least(length(payload) - 1, "
                f"{(max_frames - 1) * frame_interval}), {frame_interval}), "
                f"off -> substring(payload, off + 1, {frame_interval}))"
            )
        ).alias("frame_no", "frame_bytes"),
    ).select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.length("frame_bytes").cast("long").alias("frame_len"),
    )
