"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is split:

- ``decode_media``: tries real decoders (PIL / soundfile) behind import
  guards and raises ``NotImplementedError`` if unavailable — the clearly
  marked stub;
- ``fake_decode_media``: a deterministic md5-derived "decoder" that
  exercises the REAL Spark-side plumbing (binary columns, Arrow batch
  transfer, schema contract, per-partition batching) with reproducible
  outputs, so the pipeline shape is testable end-to-end today and the
  decoder body is swappable later.

Scale notes: mapInPandas streams Arrow batches per partition — decode
parallelism equals partition count, no driver involvement, and binary
payloads never leave the executor that read them. Repartition upstream by a
size-balanced key when media files are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "width int, height int, channels int, format string"
)


def with_media_column(df: DataFrame, source_col: str,
                      media_col: str = "media") -> DataFrame:
    """Pack a column into the opaque-binary media representation with byte
    size metadata — the storage contract for multimodal tables."""
    return df.withColumn(
        media_col,
        F.struct(
            F.col(source_col).cast("binary").alias("content"),
            F.length(F.col(source_col).cast("binary")).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ),
    )


def decode_media(df: DataFrame, media_col: str, id_col: str) -> DataFrame:
    """Real decoder path — requires an image codec library.

    STUB: the execution container ships no codecs; this raises until one is
    available. The Spark-side contract (signature, schema, batching) is the
    same as ``fake_decode_media``, which is the tested path.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decoding requires an image codec library (e.g. Pillow), "
            "not available in this environment; use fake_decode_media for "
            "plumbing tests"
        ) from exc
    raise NotImplementedError("real decoder wiring lands with the codec")


def fake_decode_media(df: DataFrame, media_col: str, id_col: str) -> DataFrame:
    """Deterministic stand-in decoder over the real plumbing.

    Derives (width, height, channels, format) from the md5 of the content
    bytes — stable across engines and runs, so oracles can verify the
    whole distributed pipeline.
    """
    out_schema = f"{id_col} long, n_bytes int, {MEDIA_META_SCHEMA}"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            metas = []
            for _i, row in pdf.iterrows():
                content = row["__content"] or b""
                digest = hashlib.md5(content).hexdigest()
                metas.append(
                    (
                        row["__id"],
                        len(content),
                        1 + int(digest[0:2], 16),
                        1 + int(digest[2:4], 16),
                        1 + int(digest[4], 16) % 4,
                        "fake/" + digest[5],
                    )
                )
            yield pd.DataFrame(
                metas,
                columns=[id_col, "n_bytes", "width", "height", "channels",
                         "format"],
            )

    packed = df.select(
        F.col(id_col).alias("__id"),
        F.col(f"{media_col}.content").alias("__content"),
    )
    return packed.mapInPandas(decode, schema=out_schema)


def sample_frames(df: DataFrame, media_col: str, id_col: str,
                  frame_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling plumbing: split the opaque payload into fixed-size
    chunks ("frames") with indices — JVM-side only (no Python), the shape a
    real video frame-sampler plugs into."""
    content = F.col(f"{media_col}.content")
    n_frames = F.least(
        F.ceil(F.length(content) / F.lit(frame_bytes)).cast("int"),
        F.lit(max_frames),
    )
    return (
        df.select(
            F.col(id_col),
            content.alias("__content"),
            F.posexplode(F.sequence(F.lit(1), n_frames)).alias("frame_idx", "_o"),
        )
        .select(
            id_col,
            "frame_idx",
            F.substring(
                F.col("__content"),
                F.col("frame_idx") * frame_bytes + 1,
                frame_bytes,
            ).alias("frame_bytes"),
        )
    )
