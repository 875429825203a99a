"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, plus Arrow-batched decode / feature-extract /
resize / frame-sample stages.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind the real Spark plumbing (schema, batching,
partitioning are what this module actually ships — swap ``_fake_decode``
for a PIL/ffmpeg call in production). The binary payloads themselves are
synthesized from the documents table (utf-8 bytes), which makes the
metadata path (sizes, hashes) fully oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a media-shaped table: one binary payload + typed
    metadata struct per row, as a multimodal lakehouse table would store
    (payload inline for small media; at scale the column holds an object
    reference and byte-range instead)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/fake-media").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("language_hint"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


@register(
    "mm1_media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
)
def mm1_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: byte length + content hash per payload
    — the dedup/integrity scan over a multimodal table. All JVM-side;
    at scale this runs as a projection over the binary column without
    decoding anything."""
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """STUB decode kernel — deterministic stand-in for an image decoder.

    Production: replace with e.g. PIL.Image.open(io.BytesIO(buf)). Here:
    interpret bytes as a uint8 stream reshaped to (n, 16) 'pixel rows'.
    """
    arr = np.frombuffer(buf, dtype=np.uint8)
    n = (len(arr) // 16) * 16
    if n == 0:
        return np.zeros((1, 16), dtype=np.uint8)
    return arr[:n].reshape(-1, 16)


@register("mm2_media_features", oracle=None)  # stubbed decode — rows-only
def mm2_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas:
    Arrow delivers whole batches of payloads to Python; the kernel decodes
    and emits fixed-width feature vectors. This is the plumbing shape for
    image embedding / audio fingerprinting at scale: batch-vectorized,
    schema-stable, decode errors isolated per row."""
    m = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                img = _fake_decode(bytes(buf))
                rows.append(
                    {
                        "media_id": media_id,
                        "height": int(img.shape[0]),
                        "width": int(img.shape[1]),
                        "mean_intensity": float(img.mean()),
                        "feature": img.mean(axis=0).astype("float32").tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return m.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, height int, width int, "
            "mean_intensity double, feature array<float>"
        ),
    )


@register("mm3_frame_sample", oracle=None)  # stubbed decode — rows-only
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video → every k-th frame): one input row
    fans out to multiple frame rows — the row-expanding mapInPandas shape.
    Stub 'frames' are 16-byte slices; production swaps in an ffmpeg/pyav
    iterator. Output is partition-friendly: (media_id, frame_no) key."""
    m = media_table(spark, sf_dir)
    stride = 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_bytes = [], [], []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                frames = _fake_decode(bytes(buf))
                for frame_no in range(0, len(frames), stride):
                    out_ids.append(media_id)
                    out_nos.append(frame_no)
                    out_bytes.append(frames[frame_no].tobytes())
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame": out_bytes}
            )

    return m.select("media_id", "payload").mapInPandas(
        sample, schema="media_id long, frame_no int, frame binary"
    )


@register("mm4_media_resize", oracle=None)  # stubbed decode — rows-only
def mm4_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/transcode plumbing: decode → downsample → re-encode, the
    1:1 payload-transform shape (thumbnailing, audio resampling). The
    stub kernel mean-pools 2x2 blocks of the fake pixel matrix and emits
    the smaller payload plus before/after dims; production swaps the
    kernel for PIL resize / libsamplerate without touching the Spark
    plumbing. Output schema is stable and the transform is per-row
    independent — embarrassingly parallel, no shuffle at any scale."""
    m = media_table(spark, sf_dir)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                img = _fake_decode(bytes(buf))
                h = (img.shape[0] // 2) * 2
                if h == 0:
                    small = img[:1, ::2]
                else:
                    small = (
                        img[:h].reshape(h // 2, 2, 8, 2).mean(axis=(1, 3))
                    ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": media_id,
                        "src_h": int(img.shape[0]),
                        "src_w": int(img.shape[1]),
                        "dst_h": int(small.shape[0]),
                        "dst_w": int(small.shape[1]),
                        "resized": small.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return m.select("media_id", "payload").mapInPandas(
        resize,
        schema=(
            "media_id long, src_h int, src_w int, "
            "dst_h int, dst_w int, resized binary"
        ),
    )
