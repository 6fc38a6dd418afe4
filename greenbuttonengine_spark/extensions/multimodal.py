"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata.

The container has no codec libraries (PIL/librosa/ffmpeg), so the
DECODE step is stubbed — raising NotImplementedError with install
guidance, or substituting a deterministic fake when
``allow_fake=True`` — while the Spark-side plumbing is real and tested:

* schema: (id, media binary, media_meta struct<kind,width,height,n_bytes>)
* partition-aware batch processing via mapInPandas (Arrow binary
  batches — the shape a real decoder would consume)
* a pure-numpy feature extractor (byte histogram) standing in for an
  embedding model, vectorized per Arrow batch

At 100 TB: binary payloads dominate row size — keep them OUT of
shuffles (extract features first, then drop the blob), and size
``spark.sql.files.maxPartitionBytes`` so one task's batch of blobs
fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # the real decoder dependency is absent in this environment
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

HIST_BINS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_histogram", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_fake_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media: unhex(md5(text) || md5(text||'#2')) — a
    stand-in binary payload with realistic plumbing (binary type + meta
    struct).  The second half salts with concat, NOT reverse(text):
    DuckDB reverses grapheme clusters while Spark reverses codepoints,
    so a reverse-based blob diverges cross-engine on combining marks
    (latent on the ASCII corpus, but the oracle must not depend on it)."""
    blob = F.unhex(
        F.concat(
            F.md5(F.col(text_col)),
            F.md5(F.concat(F.col(text_col), F.lit("#2"))),
        )
    )
    meta = F.struct(
        F.lit("image/fake").alias("kind"),
        F.lit(8).alias("width"),
        F.lit(4).alias("height"),
        F.length(blob).cast("long").alias("n_bytes"),
    )
    return docs.select(F.col(id_col), blob.alias("media"), meta.alias("media_meta"))


def decode_image(blob: bytes):
    """Decode a real image — requires a codec library not present here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "Image decode requires Pillow; install `pillow` on the cluster "
            "image. Use extract_features(..., allow_fake=True) for the "
            "deterministic stand-in path."
        )
    import io

    return Image.open(io.BytesIO(blob))  # pragma: no cover


def extract_features(
    media: DataFrame, allow_fake: bool = True, id_col: str = "doc_id"
) -> DataFrame:
    """Per-blob feature extraction via mapInPandas (Arrow batches).

    The fake path computes a 16-bin byte histogram with vectorized
    numpy — the same batch shape (binary in, fixed-width array out)
    a real image/audio embedder would use."""
    if not allow_fake and not _HAS_PIL:
        raise NotImplementedError("No codec available and allow_fake=False")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, sizes = [], []
            for blob in pdf["media"]:
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=HIST_BINS).astype(np.float64)
                feats.append((hist / max(len(arr), 1)).tolist())
                sizes.append(len(arr))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "n_bytes": sizes, "byte_histogram": feats}
            )

    return media.select(F.col(id_col), "media").mapInPandas(batches, schema=FEATURE_SCHEMA)


def attach_fake_video_meta(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake VIDEO metadata: duration/fps derived from the
    text (stable across runs), the binary payload standing in for the
    container bytes.  Real ingestion would read these fields from the
    container header (ffprobe) at write time — the point is the column
    SHAPE: (media binary, media_meta struct with temporal fields)."""
    blob = F.unhex(F.concat(F.md5(F.col(text_col)), F.md5(F.reverse(F.col(text_col)))))
    dur = (F.length(F.col(text_col)) % 300 + 5).cast("double")  # 5..304 s
    fps = (F.length(F.col(text_col)) % 3 * 6 + 12).cast("double")  # 12/18/24
    meta = F.struct(
        F.lit("video/fake").alias("kind"),
        dur.alias("duration_s"),
        fps.alias("fps"),
        F.length(blob).cast("long").alias("n_bytes"),
    )
    return docs.select(F.col(id_col), blob.alias("media"), meta.alias("media_meta"))


def sample_frames(
    media: DataFrame,
    every_n_seconds: float = 10.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling PLAN: one row per sampled frame with its
    timestamp and frame index, computed purely from the metadata struct
    (duration, fps) — no decode, pure Catalyst sequence/explode, so the
    blob never enters the explode (it is dropped first; at 100 TB the
    decoded-frame extraction joins back to the blob column by id inside
    the scan-stage mapInPandas decoder).

    Output: (doc_id, sample_idx, t_seconds, frame_idx) — frame_idx =
    floor(t * fps), the exact input a seek-based decoder consumes."""
    n_samples = F.floor(
        F.col("media_meta.duration_s") / F.lit(float(every_n_seconds))
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_samples))
    out = (
        media.select(F.col(id_col), "media_meta")
        .withColumn("sample_idx", idx)
        .withColumn(
            "t_seconds", F.col("sample_idx") * F.lit(float(every_n_seconds))
        )
        .withColumn(
            "frame_idx",
            F.floor(F.col("t_seconds") * F.col("media_meta.fps")).cast("long"),
        )
    )
    return out.select(
        F.col(id_col),
        F.col("sample_idx").cast("long").alias("sample_idx"),
        F.col("t_seconds"),
        "frame_idx",
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), False),
                    T.StructField("width", T.IntegerType(), False),
                    T.StructField("height", T.IntegerType(), False),
                    T.StructField("n_bytes", T.LongType(), False),
                ]
            ),
            False,
        ),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    allow_fake: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize each image blob to (width, height) via mapInPandas.

    Real path: PIL decode -> resize -> re-encode (requires Pillow,
    absent in this container).  Fake path: deterministic nearest-
    neighbor byte resampling to width*height bytes — same Arrow batch
    shape, same output schema (blob + updated meta), so swapping the
    codec in changes ONE function body, not the plumbing.

    Scale: a narrow per-row transform in the scan stage; the resized
    blob (typically much smaller) replaces the original before any
    wide operation, shrinking every downstream shuffle.
    """
    if not allow_fake and not _HAS_PIL:
        raise NotImplementedError(
            "Image resize requires Pillow; install `pillow` on the "
            "cluster image, or pass allow_fake=True for the "
            "deterministic stand-in path."
        )
    n_out = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs, metas = [], []
            for blob in pdf["media"]:
                arr = np.frombuffer(blob, dtype=np.uint8)
                idx = (np.arange(n_out) * max(len(arr), 1) // n_out).clip(
                    0, max(len(arr) - 1, 0)
                )
                out = arr[idx] if len(arr) else np.zeros(n_out, dtype=np.uint8)
                blobs.append(out.tobytes())
                metas.append(
                    {
                        "kind": "image/fake-resized",
                        "width": width,
                        "height": height,
                        "n_bytes": n_out,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "media": blobs, "media_meta": metas}
            )

    return media.select(F.col(id_col), "media").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )
