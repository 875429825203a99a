"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, plus Arrow-batched decode / feature-extract /
resize / frame-sample stages.

The media fixture is REAL image bytes: each document's text is rendered
into a 16×8 RGB PPM (P6) — a complete, spec-conformant binary image
format that needs no external codec (pure numpy decode). Because the
pixel bytes derive deterministically from the text, DuckDB can recompute
decoded dims / means / resized hashes straight from the text column, so
the decode and resize paths are fully oracle-checked, not stubbed.
mm3's frame sampler treats pixel rows as frames (the row-expansion
plumbing shape); a production video path would swap in an ffmpeg/pyav
iterator behind the same mapInPandas signature.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register

PPM_W, PPM_H = 16, 8
PPM_PIXBYTES = PPM_W * PPM_H * 3  # 384
_PPM_HEADER = f"P6\n{PPM_W} {PPM_H}\n255\n"

# pixel stream: the doc's ascii bytes repeated to fill exactly 384 bytes.
# Kept as a SQL expression so payload construction is JVM-side (codegen)
# and the DuckDB oracles can rebuild the identical bytes from `text`.
_PIXELS_SQL = (
    f"substring(repeat(text, CAST(ceil({PPM_PIXBYTES}.0 / length(text)) "
    f"AS INT)), 1, {PPM_PIXBYTES})"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a media-shaped table: one real PPM image payload +
    typed metadata struct per row, as a multimodal lakehouse table would
    store (payload inline for small media; at scale the column holds an
    object reference and byte-range instead)."""
    # a small corpus file is one split and the decode kernels downstream
    # are CPU-bound — pin their parallelism here so every mm operator
    # inherits it (the AQE byte-based-coalescing trap, see j10/dd8)
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par, "doc_id")
    payload = F.encode(
        F.concat(F.lit(_PPM_HEADER), F.expr(_PIXELS_SQL)), "utf-8"
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("language_hint"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_ppm(buf: bytes) -> np.ndarray:
    """Real P6 PPM decoder (pure numpy): parse magic/dims/maxval from the
    header, return the pixel array shaped (height, width, 3) uint8."""
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", buf)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    pixels = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return pixels.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """P6 PPM encoder: (h, w, 3) uint8 → complete image bytes."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


# oracle CTEs shared by mm2/mm3/mm4: the pixel character stream (base.s)
# and its byte values (px.b), rebuilt from text exactly as the JVM-side
# payload expression does (ascii corpus: char position == byte position)
_BASE_CTE = f"""
    WITH base AS (
        SELECT doc_id,
               substr(repeat(text, CAST(ceil({PPM_PIXBYTES}.0 / LEN(text))
                   AS INT)), 1, {PPM_PIXBYTES}) AS s
        FROM documents
    )
"""
_PX_CTE = (
    _BASE_CTE
    + f""", px AS (
        SELECT doc_id,
               [unicode(substr(s, i, 1))
                FOR i IN generate_series(1, {PPM_PIXBYTES})] AS b
        FROM base
    )
"""
)


@register(
    "mm1_media_metadata",
    oracle=f"""
    SELECT doc_id AS media_id,
           {len(_PPM_HEADER) + PPM_PIXBYTES} AS n_bytes,
           sha256(concat('P6', chr(10), '{PPM_W} {PPM_H}', chr(10), '255',
                  chr(10),
                  substr(repeat(text, CAST(ceil({PPM_PIXBYTES}.0 / LEN(text))
                      AS INT)), 1, {PPM_PIXBYTES}))) AS payload_sha256
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


def media_features(m: DataFrame) -> DataFrame:
    """Decode + feature-extract over a (media_id, payload) frame via
    mapInPandas — the reusable kernel behind mm2; see its docstring."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                # per-row error isolation: a corrupt payload yields a null
                # feature row + reason, never a failed task (at 100 TB some
                # payloads WILL be truncated/mislabeled)
                try:
                    img = decode_ppm(bytes(buf))
                except ValueError as e:
                    rows.append(
                        {"media_id": media_id, "decode_error": str(e)}
                    )
                    continue
                h, w, _ = img.shape
                n = h * w
                rows.append(
                    {
                        "media_id": media_id,
                        "height": h,
                        "width": w,
                        "mean_intensity": int(img.sum()) / (n * 3),
                        "mean_r": int(img[:, :, 0].sum()) / n,
                        "mean_g": int(img[:, :, 1].sum()) / n,
                        "mean_b": int(img[:, :, 2].sum()) / n,
                        "decode_error": None,
                    }
                )
            yield pd.DataFrame(rows)

    return m.select("media_id", "payload").mapInPandas(
        extract,
        schema=(
            "media_id long, height int, width int, mean_intensity double, "
            "mean_r double, mean_g double, mean_b double, decode_error string"
        ),
    )


@register(
    "mm2_media_features",
    oracle=_PX_CTE
    + f"""
    SELECT doc_id AS media_id, {PPM_H} AS height, {PPM_W} AS width,
           CAST(list_sum(b) AS DOUBLE) / {PPM_PIXBYTES} AS mean_intensity,
           CAST(list_sum([b[3*i-2] FOR i IN generate_series(1, {PPM_W * PPM_H})])
                AS DOUBLE) / {PPM_W * PPM_H} AS mean_r,
           CAST(list_sum([b[3*i-1] FOR i IN generate_series(1, {PPM_W * PPM_H})])
                AS DOUBLE) / {PPM_W * PPM_H} AS mean_g,
           CAST(list_sum([b[3*i] FOR i IN generate_series(1, {PPM_W * PPM_H})])
                AS DOUBLE) / {PPM_W * PPM_H} AS mean_b,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM px
    """,
)
def mm2_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas:
    Arrow delivers whole batches of payloads to Python; the kernel runs a
    REAL PPM decode and emits per-image dims + intensity/channel means.
    Means are integer sums divided by a constant, so both engines produce
    bit-identical doubles. This is the plumbing shape for image embedding
    at scale: batch-vectorized, schema-stable, decode errors isolated per
    row (corrupt payload → null features + reason, never a failed task)."""
    return media_features(media_table(spark, sf_dir))


@register(
    "mm3_frame_sample",
    # frames are decoded pixel rows at stride 4 (rows 0 and 4 of the
    # 16×8 image) — 48-byte slices of the deterministic pixel stream,
    # so the oracle rebuilds the exact frame bytes from text
    # hex projection (not raw binary) in the checked output: binary cells
    # round-trip as bytes vs bytearray across engines/drivers, which a
    # hash-based checker may canonicalize differently; hex is unambiguous
    oracle=_BASE_CTE
    + f"""
    SELECT doc_id AS media_id, frame_no,
           hex(encode(substr(s, frame_no * {PPM_W * 3} + 1, {PPM_W * 3})))
               AS frame_hex
    FROM base, UNNEST([0, 4]) AS t(frame_no)
    """,
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video → every k-th frame): one input row
    fans out to multiple frame rows — the row-expanding mapInPandas shape.
    'Frames' here are decoded pixel rows of the PPM; production swaps in
    an ffmpeg/pyav iterator behind the same signature. Output is
    partition-friendly: (media_id, frame_no) key."""
    m = media_table(spark, sf_dir)
    stride = 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_bytes = [], [], []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_ppm(bytes(buf))
                for frame_no in range(0, len(frames), stride):
                    out_ids.append(media_id)
                    out_nos.append(frame_no)
                    out_bytes.append(frames[frame_no].tobytes())
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame": out_bytes}
            )

    frames = m.select("media_id", "payload").mapInPandas(
        sample, schema="media_id long, frame_no int, frame binary"
    )
    # binary frames stay the plumbing product; the registered output
    # projects them to hex for engine-neutral differential checking
    return frames.select(
        "media_id", "frame_no", F.hex("frame").alias("frame_hex")
    )


# mm5 aHash geometry: the 16x8 image pools 2x1 to an 8x8 grid; each
# cell's gray value is the exact integer sum of its 6 RGB bytes, and
# bit k is set iff cell_k * 64 > total (the average-hash rule with the
# division cleared — all-integer, so both engines agree bit for bit).
_AHASH_CELLS = 64


def ahash_signatures(m: DataFrame) -> DataFrame:
    """(media_id, ahash_bits): the 64-bit aHash signature per payload —
    the reusable kernel behind mm5 (see its docstring for the exact
    integer-arithmetic bit rule); also composed by the media corpus
    build (ingest/media_corpus.py) for its perceptual-dedup stage."""

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(buf)).astype(np.int64)
                h, w, _ = img.shape
                G = img.reshape(h, w // 2, 2, 3).sum(axis=(2, 3))
                flat = G.reshape(-1)
                total = int(flat.sum())
                bits = "".join(
                    "1" if int(g) * _AHASH_CELLS > total else "0"
                    for g in flat
                )
                ids.append(media_id)
                sigs.append(bits)
            yield pd.DataFrame({"media_id": ids, "ahash_bits": sigs})

    return m.select("media_id", "payload").mapInPandas(
        ahash, schema="media_id long, ahash_bits string"
    )


def _ahash_cell_sql(k: str) -> str:
    """Sum of the 6 bytes of 8x8 cell ``k`` (1-based) over px.b."""
    terms = []
    for p in range(2):  # two pooled pixels per cell
        for j in range(1, 4):  # r, g, b bytes
            terms.append(
                f"b[(({k}-1)//8*{PPM_W} + 2*(({k}-1)%8) + {p})*3 + {j}]"
            )
    return " + ".join(terms)


@register(
    "mm5_perceptual_hash_dedup",
    oracle=_PX_CTE
    + f""", g AS (
        SELECT doc_id,
               [{_ahash_cell_sql('k')}
                FOR k IN generate_series(1, {_AHASH_CELLS})] AS gv
        FROM px
    ), sig AS (
        SELECT doc_id,
               ARRAY_TO_STRING(list_transform(
                   generate_series(1, {_AHASH_CELLS}),
                   k -> CASE WHEN gv[k] * {_AHASH_CELLS} > list_sum(gv)
                             THEN '1' ELSE '0' END), '') AS ahash_bits
        FROM g
    )
    SELECT ahash_bits, COUNT(*) AS n_media,
           ARRAY_TO_STRING(LIST_SORT(LIST(doc_id)), ',') AS media_ids
    FROM sig GROUP BY ahash_bits HAVING COUNT(*) > 1
    """,
)
def mm5_perceptual_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup by perceptual hash (aHash): REAL decode -> 2x1
    mean-pool to an 8x8 grid -> per-cell gray integer -> 64-bit
    signature (bit = cell brighter than the image average), bucketed on
    the whole signature; groups >1 are perceptual duplicates. The
    average comparison is division-cleared (cell*64 > total), so the
    whole pipeline is exact integer arithmetic and the oracle recomputes
    every bit from the text-derived pixel stream — a differentially
    checked perceptual hash.

    This is the image-side analogue of dd5's SimHash buckets: for
    near-duplicate (not identical) signatures, feed these 64-bit strings
    to the dd5b block-pigeonhole multi-probe join — the same Hamming
    machinery applies unchanged. Per-row decode, Arrow-batched, one
    bucket shuffle; at 100 TB the signature becomes a stored column and
    dedup is a groupBy over it."""
    sigs = ahash_signatures(media_table(spark, sf_dir))
    return (
        sigs.groupBy("ahash_bits")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.array_join(
                F.array_sort(F.collect_list("media_id")).cast("array<string>"),
                ",",
            ).alias("media_ids"),
        )
        .filter(F.col("n_media") > 1)
    )


@register(
    "mm4_media_resize",
    oracle=_PX_CTE
    + f"""
    , pooled AS (
        SELECT doc_id,
               [ (b[((2*((k-1)//{PPM_W // 2 * 3}))*{PPM_W}
                    + 2*(((k-1)%{PPM_W // 2 * 3})//3))*3 + ((k-1)%3) + 1]
                + b[((2*((k-1)//{PPM_W // 2 * 3}))*{PPM_W}
                    + 2*(((k-1)%{PPM_W // 2 * 3})//3) + 1)*3 + ((k-1)%3) + 1]
                + b[((2*((k-1)//{PPM_W // 2 * 3}) + 1)*{PPM_W}
                    + 2*(((k-1)%{PPM_W // 2 * 3})//3))*3 + ((k-1)%3) + 1]
                + b[((2*((k-1)//{PPM_W // 2 * 3}) + 1)*{PPM_W}
                    + 2*(((k-1)%{PPM_W // 2 * 3})//3) + 1)*3 + ((k-1)%3) + 1]
                ) // 4
                FOR k IN generate_series(1, {PPM_PIXBYTES // 4})] AS pb
        FROM px
    )
    SELECT doc_id AS media_id,
           {PPM_H} AS src_h, {PPM_W} AS src_w,
           {PPM_H // 2} AS dst_h, {PPM_W // 2} AS dst_w,
           sha256(concat('P6', chr(10), '{PPM_W // 2} {PPM_H // 2}',
                  chr(10), '255', chr(10),
                  array_to_string([chr(x) FOR x IN pb], '')))
               AS resized_sha256
    FROM pooled
    """,
)
def mm4_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/transcode: REAL decode → 2×2 mean-pool (integer sum // 4,
    exact in both engines) → re-encode to a valid smaller PPM, emitting
    before/after dims plus the sha256 of the resized image so the oracle
    can verify the whole decode-transform-encode path byte-for-byte.
    Per-row independent — embarrassingly parallel, no shuffle at any
    scale."""
    m = media_table(spark, sf_dir)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(buf))
                h, w, _ = img.shape
                small = (
                    img.astype(np.uint32)
                    .reshape(h // 2, 2, w // 2, 2, 3)
                    .sum(axis=(1, 3))
                    // 4
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": media_id,
                        "src_h": h,
                        "src_w": w,
                        "dst_h": int(small.shape[0]),
                        "dst_w": int(small.shape[1]),
                        "resized_sha256": hashlib.sha256(
                            encode_ppm(small)
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return m.select("media_id", "payload").mapInPandas(
        resize,
        schema=(
            "media_id long, src_h int, src_w int, "
            "dst_h int, dst_w int, resized_sha256 string"
        ),
    )


# --- audio: real RIFF/WAVE PCM payloads ------------------------------------

WAV_N = 512  # samples per clip (multiple of 8 -> exact integer ms)
WAV_RATE = 8000  # Hz, 8-bit unsigned mono PCM


def encode_wav(samples: bytes) -> bytes:
    """Spec-conformant RIFF/WAVE container around 8-bit unsigned mono
    PCM — a complete binary audio format needing no external codec
    (pure struct packing), the audio twin of the PPM image path."""
    import struct

    n = len(samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE, 1, 8)
        + b"data"
        + struct.pack("<I", n)
        + samples
    )


def decode_wav(buf: bytes) -> np.ndarray:
    """Parse a RIFF/WAVE container: validate magics, walk the chunk
    list (word-aligned), require 8-bit unsigned mono PCM, return the
    sample vector. A real decoder, not a fixed-offset slice — it
    tolerates extra chunks the way real WAV files carry LIST/INFO."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if (audio_format, channels, bits) != (1, 1, 8):
        raise ValueError(f"unsupported PCM layout {(audio_format, channels, bits)}")
    if rate != WAV_RATE:
        raise ValueError(f"unexpected rate {rate}")
    return np.frombuffer(data, dtype=np.uint8)


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → an audio-shaped media table: one real WAV payload
    ({WAV_N} samples of 8-bit mono PCM whose bytes derive
    deterministically from the text, the same fixture rule as the PPM
    images) + typed metadata per row."""
    par = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(par, "doc_id")
        .select("doc_id", "text", "source")
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, source in zip(
                pdf["doc_id"], pdf["text"], pdf["source"]
            ):
                # the DuckDB oracle rebuilds these bytes from TEXT via
                # ord/substring (characters); byte==char only for ASCII
                # — fail loudly rather than silently diverge on a
                # non-ASCII corpus (r4 advice)
                assert text.isascii(), f"non-ASCII doc {doc_id}"
                raw = text.encode("utf-8")
                reps = -(-WAV_N // max(len(raw), 1))
                samples = (raw * reps)[:WAV_N]
                rows.append(
                    {
                        "media_id": doc_id,
                        "payload": encode_wav(samples),
                        "mime": "audio/wav",
                        "origin": source,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        build,
        schema="media_id long, payload binary, mime string, origin string",
    )


@register(
    "mm6_audio_features",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               substring(repeat(text,
                   CAST(ceil({WAV_N}.0 / length(text)) AS INT)),
                   1, {WAV_N}) AS s
        FROM documents
    ), samp AS (
        SELECT doc_id,
               list_transform(str_split_regex(s, ''), c -> ord(c)) AS v
        FROM base
    )
    SELECT doc_id AS media_id,
           CAST({WAV_N} AS BIGINT) AS n_samples,
           CAST({WAV_N} * 1000 / {WAV_RATE} AS BIGINT) AS duration_ms,
           CAST(list_max(v) AS BIGINT) AS peak,
           ROUND(CAST(list_sum(v) AS DOUBLE) / {WAV_N}, 6) AS mean_amp,
           ROUND(sqrt(CAST(list_sum(list_transform(v, x -> x * x))
                           AS DOUBLE) / {WAV_N}), 6) AS rms,
           CAST(LEN(list_filter(range(1, {WAV_N}),
                    i -> (v[i] < 128) != (v[i + 1] < 128))) AS BIGINT)
               AS zero_crossings
    FROM samp
    """,
)
def mm6_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over REAL WAV payloads: the kernel
    parses the RIFF container (chunk walk, PCM layout validation) and
    reduces each clip to exact integer accumulators — sample count,
    peak, amplitude sum, energy sum, midline (zero) crossings — with
    the float features (mean amplitude, RMS energy) derived JVM-side as
    single IEEE divisions over those exact integers (the lm2/x7 parity
    rule), so the DuckDB oracle recomputing from the text-derived
    sample stream hash-matches bit for bit.

    Shape: one Arrow mapInPandas pass over the payloads (numpy uint8
    vector ops per clip, no per-sample Python), zero shuffles after the
    pinned-parallelism repartition the media fixture shares. At scale
    this is the ingest-side featurization that gates audio corpora
    (silence/clipping screens, duration accounting) before any model
    sees a byte; a production path swaps the codec for ffmpeg behind
    the same batch signature."""
    audio = audio_table(spark, sf_dir)

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                v = decode_wav(bytes(buf)).astype(np.int64)
                below = v < 128
                rows.append(
                    {
                        "media_id": media_id,
                        "n_samples": int(v.size),
                        "peak": int(v.max()),
                        "sum_amp": int(v.sum()),
                        "sum_sq": int((v * v).sum()),
                        "zero_crossings": int(
                            np.count_nonzero(below[:-1] != below[1:])
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    acc = audio.select("media_id", "payload").mapInPandas(
        features,
        schema=(
            "media_id long, n_samples long, peak long, "
            "sum_amp long, sum_sq long, zero_crossings long"
        ),
    )
    n = F.col("n_samples")
    return acc.select(
        "media_id",
        "n_samples",
        (n * 1000 / WAV_RATE).cast("long").alias("duration_ms"),
        "peak",
        F.round(F.col("sum_amp") / n, 6).alias("mean_amp"),
        F.round(F.sqrt(F.col("sum_sq") / n), 6).alias("rms"),
        "zero_crossings",
    )


# --- video: real YUV4MPEG2 (Y4M) container payloads -------------------------

Y4M_W, Y4M_H = 16, 8
Y4M_FRAMES = 6
Y4M_PLANE = Y4M_W * Y4M_H  # 128 bytes per plane (C444: Y,U,V full size)
Y4M_FSZ = 3 * Y4M_PLANE  # bytes per frame
Y4M_STREAM = Y4M_FRAMES * Y4M_FSZ
_Y4M_HEADER = f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C444\n".encode()
Y4M_SAMPLE_EVERY = 2  # mm7 samples frames 0, 2, 4


def encode_y4m(stream: bytes) -> bytes:
    """Spec-conformant YUV4MPEG2 container around raw C444 planes — a
    complete video file format with no compression, so no external
    codec is needed (the video leg of the PPM/WAV fixture family)."""
    assert len(stream) == Y4M_STREAM
    out = [_Y4M_HEADER]
    for i in range(Y4M_FRAMES):
        out.append(b"FRAME\n")
        out.append(stream[i * Y4M_FSZ : (i + 1) * Y4M_FSZ])
    return b"".join(out)


def decode_y4m(buf: bytes) -> np.ndarray:
    """Parse a Y4M stream: validate the signature, read the header
    parameters (width/height/colorspace), then walk FRAME markers
    (each may carry frame-level params up to its newline). Returns
    (frames, 3, H, W) uint8 planes."""
    nl = buf.index(b"\n")
    header = buf[:nl].decode("ascii")
    parts = header.split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    params = {p[0]: p[1:] for p in parts[1:] if p}
    w, h = int(params["W"]), int(params["H"])
    if params.get("C", "420") != "444":
        raise ValueError(f"unsupported colorspace C{params.get('C')}")
    plane = w * h
    pos = nl + 1
    frames = []
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        raw = buf[pos : pos + 3 * plane]
        frames.append(
            np.frombuffer(raw, dtype=np.uint8).reshape(3, h, w)
        )
        pos += 3 * plane
    return np.stack(frames)


def video_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a video-shaped media table: one real Y4M payload
    ({Y4M_FRAMES} frames of {Y4M_W}x{Y4M_H} C444 planes whose bytes
    derive deterministically from the text) + typed metadata."""
    par = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(par, "doc_id")
        .select("doc_id", "text", "source")
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, source in zip(
                pdf["doc_id"], pdf["text"], pdf["source"]
            ):
                # byte==char only for ASCII; the oracle works on
                # characters (see the wav builder's guard)
                assert text.isascii(), f"non-ASCII doc {doc_id}"
                raw = text.encode("utf-8")
                reps = -(-Y4M_STREAM // max(len(raw), 1))
                stream = (raw * reps)[:Y4M_STREAM]
                rows.append(
                    {
                        "media_id": doc_id,
                        "payload": encode_y4m(stream),
                        "mime": "video/x-yuv4mpeg",
                        "origin": source,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        build,
        schema="media_id long, payload binary, mime string, origin string",
    )


@register(
    "mm7_video_frame_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               substring(repeat(text,
                   CAST(ceil({Y4M_STREAM}.0 / length(text)) AS INT)),
                   1, {Y4M_STREAM}) AS s
        FROM documents
    ), fr AS (
        SELECT doc_id, i AS frame_idx,
               list_transform(
                   str_split_regex(
                       substring(s, i * {Y4M_FSZ} + 1, {Y4M_PLANE}), ''),
                   c -> ord(c)) AS y
        FROM base,
             UNNEST([{", ".join(str(i) for i in
                      range(0, Y4M_FRAMES, Y4M_SAMPLE_EVERY))}]) AS u(i)
    )
    SELECT doc_id AS media_id, frame_idx,
           CAST(list_max(y) AS BIGINT) AS max_luma,
           ROUND(CAST(list_sum(y) AS DOUBLE) / {Y4M_PLANE}, 6) AS mean_luma
    FROM fr
    """,
)
def mm7_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over REAL Y4M containers: the kernel parses
    the YUV4MPEG2 header and FRAME markers (a real demuxer walk, not a
    fixed slice), samples every {Y4M_SAMPLE_EVERY}nd frame, and reduces
    each sampled frame's luma plane to exact integer accumulators; the
    float mean derives as one JVM-side IEEE division (the mm6/lm2
    parity rule), so the oracle recomputing from the text-derived byte
    stream hash-matches exactly. This is the frame-sampling shape a
    video-corpus pipeline runs before any embedding model sees a frame
    (keyframe selection, black/blank-frame screens, luma histograms);
    a production path swaps the demuxer for pyav behind the same
    mapInPandas batch signature and emits sampled frames as image rows
    into the mm2/mm4/mm5 image operators.

    Shape: one Arrow pass over payloads, numpy per-plane reductions,
    output rows = clips x sampled frames — the only expansion; zero
    shuffles after the fixture's pinned-parallelism repartition."""
    video = video_table(spark, sf_dir)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                planes = decode_y4m(bytes(buf))
                for i in range(0, planes.shape[0], Y4M_SAMPLE_EVERY):
                    y = planes[i, 0].astype(np.int64)
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": i,
                            "max_luma": int(y.max()),
                            "sum_luma": int(y.sum()),
                        }
                    )
            yield pd.DataFrame(rows)

    acc = video.select("media_id", "payload").mapInPandas(
        stats,
        schema="media_id long, frame_idx long, max_luma long, sum_luma long",
    )
    return acc.select(
        "media_id",
        "frame_idx",
        "max_luma",
        F.round(F.col("sum_luma") / Y4M_PLANE, 6).alias("mean_luma"),
    )


MM8_CUT_SAD = 4096  # scene-cut threshold on the luma SAD (tuned below)


@register(
    "mm8_scene_cuts",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               substring(repeat(text,
                   CAST(ceil({Y4M_STREAM}.0 / length(text)) AS INT)),
                   1, {Y4M_STREAM}) AS s
        FROM documents
    ), fr AS (
        SELECT doc_id, i AS frame_idx,
               list_transform(
                   str_split_regex(
                       substring(s, i * {Y4M_FSZ} + 1, {Y4M_PLANE}), ''),
                   c -> ord(c)) AS y
        FROM base,
             UNNEST([{", ".join(str(i) for i in range(Y4M_FRAMES))}])
                 AS u(i)
    ), tr AS (
        SELECT a.doc_id, b.frame_idx,
               CAST(list_sum(list_transform(
                   generate_series(1, {Y4M_PLANE}),
                   k -> abs(a.y[k] - b.y[k]))) AS BIGINT) AS sad
        FROM fr a JOIN fr b
             ON a.doc_id = b.doc_id AND b.frame_idx = a.frame_idx + 1
    )
    SELECT doc_id AS media_id, frame_idx,
           sad,
           ROUND(CAST(sad AS DOUBLE) / {Y4M_PLANE}, 6) AS mean_abs_delta,
           sad > {MM8_CUT_SAD} AS is_cut
    FROM tr
    """,
)
def mm8_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary (scene-cut) detection over the Y4M clips — the
    temporal step a video-corpus pipeline runs after mm7's per-frame
    screens: the luma SAD (sum of absolute differences) between every
    consecutive frame pair, with a cut flagged where SAD exceeds
    {MM8_CUT_SAD} (mean abs delta > {MM8_CUT_SAD}/{Y4M_PLANE} per
    pixel). Cut boundaries decide keyframe extraction and clip
    segmentation before any frame reaches an embedding model. The SAD
    is an exact integer in both engines; the cut decision compares
    integers, so no float boundary exists.

    Reference parity: extension X2' multimodal scope (SURVEY §2h);
    the same demuxer walk as mm7 (decode_y4m), one more temporal
    reduction.

    Shape: one Arrow pass over payloads; each clip's frames are local
    to its row, so consecutive-frame deltas need NO self-join or
    window on the engine side (the oracle's join is the relational
    re-expression, not the plan) — output rows = clips x (frames-1);
    zero shuffles after the fixture's pinned repartition. At 100 TB:
    identical — temporal locality inside the payload is the point."""
    video = video_table(spark, sf_dir)

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                planes = decode_y4m(bytes(buf))
                y = planes[:, 0].astype(np.int64)
                sads = np.abs(y[1:] - y[:-1]).sum(axis=(1, 2))
                for i, sad in enumerate(sads, start=1):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": i,
                            "sad": int(sad),
                        }
                    )
            yield pd.DataFrame(rows)

    acc = video.select("media_id", "payload").mapInPandas(
        cuts, schema="media_id long, frame_idx long, sad long"
    )
    return acc.select(
        "media_id",
        "frame_idx",
        "sad",
        F.round(F.col("sad") / Y4M_PLANE, 6).alias("mean_abs_delta"),
        (F.col("sad") > MM8_CUT_SAD).alias("is_cut"),
    )


MM9_WIN = 64  # samples per energy window (512 / 64 = 8 windows per clip)
MM9_SILENCE_E = 120_000  # integer energy floor: e < this => silent window


@register(
    "mm9_silence_spans",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               substring(repeat(text,
                   CAST(ceil({WAV_N}.0 / length(text)) AS INT)),
                   1, {WAV_N}) AS s
        FROM documents
    ), samp AS (
        SELECT doc_id,
               list_transform(str_split_regex(s, ''), c -> ord(c)) AS v
        FROM base
    ), win AS (
        SELECT doc_id, i AS win_id,
               list_sum(list_transform(range(1, {MM9_WIN + 1}),
                   j -> (v[{MM9_WIN} * i + j] - 128)
                        * (v[{MM9_WIN} * i + j] - 128))) AS e
        FROM samp, UNNEST(range(0, {WAV_N // MM9_WIN})) AS u(i)
    ), sil AS (
        SELECT doc_id, win_id,
               win_id - ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY win_id) AS grp
        FROM win WHERE e < {MM9_SILENCE_E}
    ), runs AS (
        SELECT doc_id, COUNT(*) AS rl FROM sil GROUP BY doc_id, grp
    ), longest AS (
        SELECT doc_id, MAX(rl) AS lr FROM runs GROUP BY doc_id
    ), wm AS (
        SELECT doc_id, win_id, e,
               MAX(e) OVER (PARTITION BY doc_id) AS doc_max_e
        FROM win
    ), agg AS (
        SELECT doc_id,
               COUNT(*) AS n_windows,
               SUM(CASE WHEN e < {MM9_SILENCE_E} THEN 1 ELSE 0 END)
                   AS n_silent,
               MAX(e) AS max_e,
               MIN(CASE WHEN e = doc_max_e THEN win_id END) AS peak_win
        FROM wm GROUP BY doc_id
    )
    SELECT agg.doc_id AS media_id,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(n_silent AS BIGINT) AS n_silent,
           CAST(COALESCE(lr, 0) AS BIGINT) AS longest_silent_run,
           CAST(peak_win AS BIGINT) AS peak_win,
           ROUND(sqrt(CAST(max_e AS DOUBLE) / {MM9_WIN}), 6) AS peak_rms
    FROM agg LEFT JOIN longest ON agg.doc_id = longest.doc_id
    """,
)
def mm9_silence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence/energy SEGMENTATION over the WAV payloads — the
    voice-activity-style screen an audio corpus build runs before
    transcription: each clip's {WAV_N} samples split into
    {WAV_N // MM9_WIN} fixed {MM9_WIN}-sample windows, each window's
    midline-deviation energy e = Σ(x-128)² decides silent
    (e < {MM9_SILENCE_E}, an INTEGER compare — the silence decision
    never touches a float), and the clip reports its silent-window
    count, LONGEST consecutive silent run (the trim/drop signal), and
    loudest window (index + RMS). mm6 is the per-clip feature pass;
    this is the per-SPAN structure pass that drives trimming.

    Shape: one Arrow mapInPandas over payloads — decode (the real RIFF
    chunk walk), an (8, {MM9_WIN}) reshape, integer energy reduction,
    and the run-length scan all inside the numpy kernel, so windows
    NEVER become rows in the engine (the oracle unnests them
    relationally and finds runs with the gaps-and-islands window —
    same semantics, expressed for a SQL engine); zero shuffles after
    the fixture's pinned repartition, output one row per clip. Engine
    parity: every published number is an exact integer except
    peak_rms, a single sqrt over an exact integer ratio (rounded 6dp,
    the mm6 rule); argmax ties break to the LOWEST window id on both
    sides (numpy argmax / MIN(win_id) FILTER e = max)."""
    audio = audio_table(spark, sf_dir)
    n_win = WAV_N // MM9_WIN

    def spans(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                v = decode_wav(bytes(buf)).astype(np.int64)
                dev = (v - 128).reshape(n_win, MM9_WIN)
                e = (dev * dev).sum(axis=1)
                silent = e < MM9_SILENCE_E
                # longest consecutive run of silent windows
                best = run = 0
                for flag in silent:
                    run = run + 1 if flag else 0
                    best = max(best, run)
                rows.append(
                    {
                        "media_id": media_id,
                        "n_windows": n_win,
                        "n_silent": int(silent.sum()),
                        "longest_silent_run": best,
                        "peak_win": int(np.argmax(e)),
                        "max_e": int(e.max()),
                    }
                )
            yield pd.DataFrame(rows)

    acc = audio.select("media_id", "payload").mapInPandas(
        spans,
        schema=(
            "media_id long, n_windows long, n_silent long, "
            "longest_silent_run long, peak_win long, max_e long"
        ),
    )
    return acc.select(
        "media_id",
        "n_windows",
        "n_silent",
        "longest_silent_run",
        "peak_win",
        F.round(F.sqrt(F.col("max_e") / MM9_WIN), 6).alias("peak_rms"),
    )


@register(
    "mm10_shot_keyframes",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               substring(repeat(text,
                   CAST(ceil({Y4M_STREAM}.0 / length(text)) AS INT)),
                   1, {Y4M_STREAM}) AS s
        FROM documents
    ), fr AS (
        SELECT doc_id, i AS frame_idx,
               list_transform(
                   str_split_regex(
                       substring(s, i * {Y4M_FSZ} + 1, {Y4M_PLANE}), ''),
                   c -> ord(c)) AS y
        FROM base,
             UNNEST([{", ".join(str(i) for i in range(Y4M_FRAMES))}])
                 AS u(i)
    ), tr AS (
        SELECT a.doc_id, b.frame_idx,
               CASE WHEN list_sum(list_transform(
                        generate_series(1, {Y4M_PLANE}),
                        k -> abs(a.y[k] - b.y[k]))) > {{cut}}
                    THEN 1 ELSE 0 END AS is_cut
        FROM fr a JOIN fr b
             ON a.doc_id = b.doc_id AND b.frame_idx = a.frame_idx + 1
    ), marked AS (
        SELECT fr.doc_id, fr.frame_idx, fr.y,
               COALESCE(SUM(is_cut) OVER (
                   PARTITION BY fr.doc_id ORDER BY fr.frame_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS shot_id
        FROM fr LEFT JOIN tr
          ON fr.doc_id = tr.doc_id AND fr.frame_idx = tr.frame_idx
    ), shots AS (
        SELECT doc_id, shot_id,
               MIN(frame_idx) AS start_frame,
               MAX(frame_idx) AS end_frame,
               COUNT(*) AS n_frames
        FROM marked GROUP BY doc_id, shot_id
    )
    SELECT s.doc_id AS media_id,
           CAST(s.shot_id AS BIGINT) AS shot_id,
           CAST(start_frame AS BIGINT) AS start_frame,
           CAST(end_frame AS BIGINT) AS end_frame,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(start_frame + (n_frames - 1) // 2 AS BIGINT)
               AS keyframe_idx,
           ROUND(CAST(list_sum(m.y) AS DOUBLE) / {Y4M_PLANE}, 6)
               AS keyframe_mean_luma
    FROM shots s
    JOIN marked m
      ON m.doc_id = s.doc_id
     AND m.frame_idx = s.start_frame + (s.n_frames - 1) // 2
    """.replace("{cut}", "4096"),
)
def mm10_shot_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYFRAME SELECTION per shot — the step after mm8: cut flags
    split each clip into shots (cumulative cut count), and each shot
    nominates its MEDIAN frame (lower middle on even lengths — a
    deterministic integer rule, the standard cheap representative
    before any embedding model sees frames) with its exact mean luma.
    mm3 samples frames on a fixed stride; mm10 samples
    content-adaptively on shot structure.

    Shape: frames are row-local inside the payload, so shots,
    medians, and luma sums all compute inside ONE Arrow kernel pass —
    no self-join, no window, zero shuffles after the fixture's pinned
    repartition; output rows = clips × shots (the oracle re-expresses
    the same per-clip walk relationally with a bounded per-doc
    window). Engine parity: everything is exact integer arithmetic
    except mean luma, a single division rounded 6dp (the mm6 rule)."""
    video = video_table(spark, sf_dir)

    def keyframes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                planes = decode_y4m(bytes(buf))
                y = planes[:, 0].astype(np.int64)  # (frames, H, W)
                sad = np.abs(np.diff(y, axis=0)).sum(axis=(1, 2))
                shot_of = np.concatenate(
                    ([0], np.cumsum(sad > MM8_CUT_SAD))
                )
                for shot in range(int(shot_of[-1]) + 1):
                    idxs = np.nonzero(shot_of == shot)[0]
                    kf = int(idxs[0] + (len(idxs) - 1) // 2)
                    rows.append(
                        {
                            "media_id": media_id,
                            "shot_id": shot,
                            "start_frame": int(idxs[0]),
                            "end_frame": int(idxs[-1]),
                            "n_frames": len(idxs),
                            "keyframe_idx": kf,
                            "luma_sum": int(y[kf].sum()),  # full-plane sum
                        }
                    )
            yield pd.DataFrame(rows)

    acc = video.select("media_id", "payload").mapInPandas(
        keyframes,
        schema=(
            "media_id long, shot_id long, start_frame long, "
            "end_frame long, n_frames long, keyframe_idx long, "
            "luma_sum long"
        ),
    )
    return acc.select(
        "media_id",
        "shot_id",
        "start_frame",
        "end_frame",
        "n_frames",
        "keyframe_idx",
        F.round(F.col("luma_sum") / Y4M_PLANE, 6).alias(
            "keyframe_mean_luma"
        ),
    )


# video near-dup: per-frame 64-bit aHash over the Y plane (128 px ->
# 64 two-pixel cells), matched on (frame_idx, hash) postings
MM11_MIN_SHARED = 1  # emit the full candidate relation (see docstring)


@register(
    "mm11_video_neardup",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               substring(repeat(text,
                   CAST(ceil({Y4M_STREAM}.0 / length(text)) AS INT)),
                   1, {Y4M_STREAM}) AS s
        FROM documents
    ), fr AS (
        SELECT doc_id, i AS frame_idx,
               list_transform(
                   str_split_regex(
                       substring(s, i * {Y4M_FSZ} + 1, {Y4M_PLANE}), ''),
                   c -> ord(c)) AS y
        FROM base,
             UNNEST([{", ".join(str(i) for i in range(Y4M_FRAMES))}])
                 AS u(i)
    ), fh AS (
        SELECT doc_id, frame_idx,
               ARRAY_TO_STRING(list_transform(
                   generate_series(1, {Y4M_PLANE // 2}),
                   k -> CASE WHEN (y[2*k-1] + y[2*k]) * {Y4M_PLANE // 2}
                                  > list_sum(y)
                             THEN '1' ELSE '0' END), '') AS fhash
        FROM fr
    )
    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           CAST(COUNT(*) AS BIGINT) AS n_matched_frames
    FROM fh a JOIN fh b
      ON a.frame_idx = b.frame_idx AND a.fhash = b.fhash
     AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= {MM11_MIN_SHARED}
    """,
)
def mm11_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO NEAR-DUP PAIRS by frame-fingerprint postings — the video
    analogue of mm5's image aHash dedup and dd8's inverted-index join:
    REAL Y4M decode -> per-frame 64-bit aHash over the Y plane (the
    128 luma bytes mean-pooled into 64 two-pixel cells; bit = cell
    brighter than the frame average, division-cleared to exact integer
    arithmetic) -> videos pair when >= {MM11_MIN_SHARED} of their
    {Y4M_FRAMES} frames hash-match AT THE SAME temporal index, ranked
    by the aligned-match count. Exact re-encodes collide on all
    {Y4M_FRAMES} frames; frame-hash sequence matching is the standard
    cheap video-copy detector that runs before any embedding model
    sees a clip. MIN_SHARED stays at 1 deliberately: the registry
    emits the FULL candidate relation with its evidence count and
    leaves the confirm threshold to the consumer, because this
    fixture's text-derived clips peak at 2 aligned matches (no two
    documents share bytes at frame granularity — a one-token edit
    shifts the whole stream), so any majority threshold would pin a
    trivially-empty result instead of exercising the pair aggregate.

    Shape: ONE Arrow decode pass emits {Y4M_FRAMES} (frame_idx, hash)
    rows per clip; the relation is localCheckpointed so the self-join
    decodes the corpus ONCE; candidates come from an equi-join on
    (frame_idx, fhash) — an inverted-index posting join, never
    all-pairs — then one pair-keyed count aggregate applies the
    majority threshold. At 100 TB the posting join inherits dd8's
    discipline: hash buckets are bounded by capping pathological
    posting lists (a frame hash shared by >F clips is boilerplate —
    drop or handle via the dd8 prefix rule); here every bucket is
    tiny. Oracle recomputes every bit from the text-derived byte
    stream (mm7's substring walk)."""
    video = video_table(spark, sf_dir)

    def fhashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r12 (guide §4.2): the per-frame Python loop (64 int() calls +
        # a string join per frame) is vectorized across ALL frames of a
        # clip — one integer comparison matrix and one bytes decode per
        # clip. Same exact-integer threshold (cell·(plane/2) > total),
        # identical bit strings.
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                planes = decode_y4m(bytes(buf))
                y = planes[:, 0].astype(np.int64)  # (frames, H, W)
                nf = y.shape[0]
                flat = y.reshape(nf, -1)
                cells = flat.reshape(nf, -1, 2).sum(axis=2)
                totals = flat.sum(axis=1)
                bits = cells * (Y4M_PLANE // 2) > totals[:, None]
                chars = (bits.astype(np.uint8) + ord("0")).tobytes().decode(
                    "ascii"
                )
                ncells = cells.shape[1]
                for f in range(nf):
                    ids.append(media_id)
                    idxs.append(f)
                    sigs.append(chars[f * ncells : (f + 1) * ncells])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "fhash": sigs}
            )

    fh = (
        video.select("media_id", "payload")
        .mapInPandas(
            fhashes, schema="media_id long, frame_idx int, fhash string"
        )
        .localCheckpoint()  # decode once; both self-join sides read this
    )
    a = fh.select(
        F.col("media_id").alias("media_a"), "frame_idx", "fhash"
    )
    b = fh.select(
        F.col("media_id").alias("media_b"), "frame_idx", "fhash"
    )
    return (
        a.join(b, ["frame_idx", "fhash"])
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched_frames"))
        .filter(F.col("n_matched_frames") >= MM11_MIN_SHARED)
    )


_AWIN = 64  # audio fingerprint windows per clip (8 samples each)


@register(
    "mm12_audio_neardup",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               substring(repeat(text,
                   CAST(ceil({WAV_N}.0 / length(text)) AS INT)),
                   1, {WAV_N}) AS s
        FROM documents
    ), samp AS (
        SELECT doc_id,
               list_transform(str_split_regex(s, ''), c -> ord(c)) AS v
        FROM base
    ), sig AS (
        SELECT doc_id,
               ARRAY_TO_STRING(list_transform(
                   generate_series(1, {_AWIN}),
                   k -> CASE WHEN list_sum(
                                 v[(k-1)*{WAV_N // _AWIN}+1 :
                                   k*{WAV_N // _AWIN}]) * {_AWIN}
                                 > list_sum(v)
                             THEN '1' ELSE '0' END), '') AS ahash_bits
        FROM samp
    )
    SELECT ahash_bits, COUNT(*) AS n_media,
           ARRAY_TO_STRING(LIST_SORT(LIST(doc_id)), ',') AS media_ids
    FROM sig GROUP BY ahash_bits HAVING COUNT(*) > 1
    """,
)
def mm12_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO PERCEPTUAL DEDUP — the third modality of the dedup
    triple (images mm5, video mm11): REAL RIFF/WAVE decode -> the
    {WAV_N}-sample clip windowed into {_AWIN} energy cells ({WAV_N
    // _AWIN} samples each) -> 64-bit time-domain envelope hash
    (bit = window louder than the clip average, division-cleared to
    exact integers — the audio analogue of aHash, the cheap
    pre-filter run before any chromaprint/spectral matcher), bucketed
    on the whole signature; groups >1 are perceptual duplicates.
    Near-identical (not byte-equal) signatures feed dd5b's
    block-pigeonhole Hamming join unchanged, exactly as mm5's
    docstring prescribes for images.

    Shape: one Arrow decode pass, one bucket shuffle, O(dup groups)
    out; at 100 TB the signature is a stored column and dedup is this
    same groupBy. Oracle recomputes every bit from the text-derived
    sample stream (mm6's substring walk)."""
    sigs = audio_table(spark, sf_dir).select("media_id", "payload")

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                v = decode_wav(bytes(buf)).astype(np.int64)
                cells = v.reshape(_AWIN, -1).sum(axis=1)
                total = int(v.sum())
                hs.append(
                    "".join(
                        "1" if int(c) * _AWIN > total else "0"
                        for c in cells
                    )
                )
                ids.append(media_id)
            yield pd.DataFrame({"media_id": ids, "ahash_bits": hs})

    return (
        sigs.mapInPandas(fp, schema="media_id long, ahash_bits string")
        .groupBy("ahash_bits")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.array_join(
                F.array_sort(F.collect_list("media_id")).cast(
                    "array<string>"
                ),
                ",",
            ).alias("media_ids"),
        )
        .filter(F.col("n_media") > 1)
    )


# --- mm13: container sniffing (ingestion routing) ----------------------------

_SNIFF_BYTES = {
    "image/ppm": len(_PPM_HEADER) + PPM_PIXBYTES,  # 396
    "audio/wav": 44 + WAV_N,  # RIFF header + 8-bit samples = 556
    "video/x-yuv4mpeg": len(_Y4M_HEADER)
    + Y4M_FRAMES * (6 + Y4M_FSZ),  # 2376
}


@register(
    "mm13_container_sniff",
    oracle=f"""
    SELECT doc_id AS media_id,
           CASE doc_id % 4
               WHEN 0 THEN 'image/ppm'
               WHEN 1 THEN 'audio/wav'
               WHEN 2 THEN 'video/x-yuv4mpeg'
               ELSE 'audio/wav' END AS declared_mime,
           CASE doc_id % 4
               WHEN 0 THEN 'image/ppm'
               WHEN 1 THEN 'audio/wav'
               WHEN 2 THEN 'video/x-yuv4mpeg'
               ELSE 'unknown' END AS sniffed_mime,
           doc_id % 4 = 3 AS mime_mismatch,
           CAST(CASE doc_id % 4
               WHEN 0 THEN {_SNIFF_BYTES["image/ppm"]}
               WHEN 2 THEN {_SNIFF_BYTES["video/x-yuv4mpeg"]}
               ELSE {_SNIFF_BYTES["audio/wav"]} END AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def mm13_container_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINER SNIFFING over a mixed binary column — the ingestion
    router every multimodal lake needs before any decoder runs: trust
    the BYTES, not the declared mime. The fixture builds a mixed table
    (doc_id%4 routes each doc through the real PPM/WAV/Y4M encoders;
    %4==3 rows are WAV payloads whose RIFF magic is overwritten with
    junk but still DECLARE audio/wav — the mislabeled-upload case),
    and the operator under test classifies purely from magic bytes:
    'P6\\n' → ppm, 'RIFF'+'WAVE' → wav, 'YUV4MPEG2 ' → y4m, else
    unknown, flagging declared-vs-sniffed mismatches.

    The sniff itself is pure JVM expression work — hex(substring) over
    the binary column, whole-stage codegen, scan-local, reads ≤ 16
    bytes of each payload's prefix (a parquet reader with column-index
    support never materializes payload tails for this plan). The
    oracle derives the expected routing and byte counts from the
    documented doc_id%4 rule + container-format arithmetic, so the
    check proves encoders and sniffer compose end-to-end."""
    par = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(par, "doc_id")
        .select("doc_id", "text")
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                assert text.isascii(), f"non-ASCII doc {doc_id}"
                raw = text.encode("utf-8")
                kind = doc_id % 4
                if kind == 0:
                    reps = -(-PPM_PIXBYTES // max(len(raw), 1))
                    payload = (
                        _PPM_HEADER.encode() + (raw * reps)[:PPM_PIXBYTES]
                    )
                    mime = "image/ppm"
                elif kind == 2:
                    reps = -(-Y4M_STREAM // max(len(raw), 1))
                    payload = encode_y4m((raw * reps)[:Y4M_STREAM])
                    mime = "video/x-yuv4mpeg"
                else:
                    reps = -(-WAV_N // max(len(raw), 1))
                    payload = encode_wav((raw * reps)[:WAV_N])
                    mime = "audio/wav"
                    if kind == 3:  # mislabeled: junk magic, wav claim
                        payload = b"JUNK" + payload[4:]
                rows.append(
                    {
                        "media_id": doc_id,
                        "payload": payload,
                        "declared_mime": mime,
                    }
                )
            yield pd.DataFrame(rows)

    mixed = docs.mapInPandas(
        build,
        schema="media_id long, payload binary, declared_mime string",
    )

    def magic(n: int, lit: bytes):
        return F.hex(F.expr(f"substring(payload, {n + 1}, {len(lit)})")) == lit.hex().upper()

    sniffed = (
        F.when(magic(0, b"P6\n"), F.lit("image/ppm"))
        .when(
            magic(0, b"RIFF") & magic(8, b"WAVE"), F.lit("audio/wav")
        )
        .when(magic(0, b"YUV4MPEG2 "), F.lit("video/x-yuv4mpeg"))
        .otherwise(F.lit("unknown"))
    )
    return mixed.select(
        "media_id",
        "declared_mime",
        sniffed.alias("sniffed_mime"),
        (sniffed != F.col("declared_mime")).alias("mime_mismatch"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
