"""Multimodal-column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side machinery — schema, partition-friendly batch
shapes, Arrow-batched ``mapInPandas`` UDF signatures — is real and
tested; the actual codec step is STUBBED (this container ships no
image/audio libraries): ``decode_stub`` produces deterministic fake
features derived from the bytes, and ``decode_real`` raises
``NotImplementedError`` with the integration point documented.

Batch shape matters at 100 TB: ``mapInPandas`` streams Arrow batches
(bounded by spark.sql.execution.arrow.maxRecordsPerBatch), so a
decode stage holds O(batch) media blobs in memory per task, never the
whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata for a media blob.
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat a text column's bytes as a media blob (the
    testdata has no real binaries). Adds ``blob: binary`` and a
    metadata struct."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_real(blob: bytes, meta) -> list[float]:
    """Integration point for a real codec (PIL/libav/torchaudio).

    Not available in this environment — the Spark-side plumbing is
    exercised through :func:`decode_stub` instead."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; plug a real "
        "decoder in here and extract_features(use_stub=False) will use it"
    )


def decode_stub(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoded features': byte-histogram moments.
    Pure function of the bytes — stable across runs/engines."""
    if not blob:
        return [0.0] * dim
    out = []
    n = len(blob)
    for i in range(dim):
        sl = blob[i::dim]
        out.append(round(sum(sl) / (255.0 * max(len(sl), 1)), 6))
    assert len(out) == dim
    return out


def extract_features(
    media: DataFrame, dim: int = 8, use_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over media blobs.

    One ``mapInPandas`` pass: per Arrow batch, decode each blob and
    emit (doc_id, n_bytes, content_hash, feat). Partitioning is
    whatever the upstream scan provides — no shuffle is introduced."""
    import hashlib

    decode = decode_stub if use_stub else decode_real

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "content_hash": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat": blobs.map(lambda b: decode(bytes(b), dim)),
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video blobs: emits one row per
    sampled frame index based on metadata (decode itself stubbed).
    Shows the explode-by-metadata pattern that keeps frame fan-out
    lazy and pushdown-friendly."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(1))
    idx = F.sequence(F.lit(0), F.greatest((n - 1) / every_n, F.lit(0)).cast("int"))
    return media.select(
        "doc_id",
        F.explode(F.transform(idx, lambda i: i * every_n)).alias("frame_idx"),
    )
