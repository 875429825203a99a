"""PPM codec + multimodal plumbing tests: the decode path is a real
parser (not a stub), so round-trip and malformed-input behavior are
testable properties."""

from __future__ import annotations

import numpy as np
import pytest

from etl_project_spark.operators import multimodal as mm


def test_ppm_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (8, 16, 3)).astype(np.uint8)
    assert (mm.decode_ppm(mm.encode_ppm(img)) == img).all()


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_ppm(b"GIF89a....")
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_media_payloads_are_valid_ppm(spark, sf_dir):
    rows = mm.media_table(spark, sf_dir).limit(20).collect()
    assert rows
    for r in rows:
        img = mm.decode_ppm(bytes(r["payload"]))
        assert img.shape == (mm.PPM_H, mm.PPM_W, 3)
        assert r["meta"]["n_bytes"] == len(bytes(r["payload"]))


def test_resize_matches_numpy_reference(spark, sf_dir):
    import hashlib

    media = {
        r["media_id"]: bytes(r["payload"])
        for r in mm.media_table(spark, sf_dir).limit(10).collect()
    }
    got = {
        r["media_id"]: r["resized_sha256"]
        for r in mm.mm4_media_resize(spark, sf_dir).collect()
    }
    for mid, buf in media.items():
        img = mm.decode_ppm(buf).astype(np.uint32)
        small = (img.reshape(4, 2, 8, 2, 3).sum(axis=(1, 3)) // 4).astype(np.uint8)
        want = hashlib.sha256(mm.encode_ppm(small)).hexdigest()
        assert got[mid] == want


def test_mm2_isolates_decode_errors(spark, sf_dir):
    """A corrupt payload must yield a null-feature row with a reason,
    not a failed job — through the real Arrow mapInPandas kernel."""
    from pyspark.sql import functions as F

    m = mm.media_table(spark, sf_dir).limit(6).select(
        "media_id",
        F.when(F.col("media_id") % 2 == 0, F.col("payload"))
        .otherwise(F.lit(b"not an image"))
        .alias("payload"),
    )
    rows = mm.media_features(m).collect()
    bad = [r for r in rows if r["decode_error"] is not None]
    good = [r for r in rows if r["decode_error"] is None]
    assert bad and good and len(rows) == 6
    assert all(r["media_id"] % 2 == 1 for r in bad)
    assert all(r["height"] is None for r in bad)
    assert all(r["mean_intensity"] is not None for r in good)


def test_wav_roundtrip_and_chunk_walk():
    """decode(encode(x)) == x, and the decoder's chunk walk tolerates
    an extra LIST chunk (with odd-length word-alignment padding)
    between fmt and data — the layout real WAV writers emit."""
    import struct

    import numpy as np

    from etl_project_spark.operators.multimodal import (
        WAV_RATE,
        decode_wav,
        encode_wav,
    )

    samples = bytes(range(256)) * 2
    assert decode_wav(encode_wav(samples)).tobytes() == samples

    extra = b"INFO-tool"  # odd length (9) -> exercises the pad byte
    wav = encode_wav(samples)
    fmt_end = 12 + 8 + 16
    padded = (
        wav[:fmt_end]
        + b"LIST"
        + struct.pack("<I", len(extra))
        + extra
        + b"\x00"
        + wav[fmt_end:]
    )
    assert decode_wav(padded).tobytes() == samples

    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + wav[4:])
    bad_rate = bytearray(wav)
    bad_rate[12 + 8 + 4 : 12 + 8 + 8] = struct.pack("<I", WAV_RATE * 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_rate))
    assert isinstance(decode_wav(wav), np.ndarray)


def test_audio_features_match_manual(spark, sf_dir):
    """mm6's features equal a driver-side recomputation from the text
    fixture rule (repeat-to-512 ascii bytes)."""
    import math

    from etl_project_spark.operators.multimodal import WAV_N
    from etl_project_spark.registry import get

    got = {
        r["media_id"]: r
        for r in get("mm6_audio_features").fn(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs[:50]:
        raw = d["text"].encode()
        v = (raw * (-(-WAV_N // len(raw))))[:WAV_N]
        r = got[d["doc_id"]]
        assert r["n_samples"] == WAV_N
        assert r["peak"] == max(v)
        assert abs(r["mean_amp"] - sum(v) / WAV_N) < 1e-6
        assert abs(r["rms"] - math.sqrt(sum(x * x for x in v) / WAV_N)) < 1e-6
        zc = sum(
            1 for i in range(WAV_N - 1) if (v[i] < 128) != (v[i + 1] < 128)
        )
        assert r["zero_crossings"] == zc


def test_y4m_roundtrip_and_header_validation():
    """decode(encode(x)) reproduces every plane byte; header width/
    height are honored; non-C444 colorspace and a bad signature are
    rejected."""
    import numpy as np
    import pytest

    from etl_project_spark.operators.multimodal import (
        Y4M_FRAMES,
        Y4M_H,
        Y4M_STREAM,
        Y4M_W,
        decode_y4m,
        encode_y4m,
    )

    stream = bytes(i % 251 for i in range(Y4M_STREAM))
    planes = decode_y4m(encode_y4m(stream))
    assert planes.shape == (Y4M_FRAMES, 3, Y4M_H, Y4M_W)
    assert planes.tobytes() == stream
    assert isinstance(planes, np.ndarray)

    wav = encode_y4m(stream)
    with pytest.raises(ValueError):
        decode_y4m(b"JUNKMPEG2" + wav[9:])
    with pytest.raises(ValueError):
        decode_y4m(wav.replace(b"C444", b"C420", 1))


def test_video_frame_stats_match_manual(spark, sf_dir):
    """mm7's per-frame stats equal a driver-side recomputation from the
    text fixture rule (sampled frames' Y planes)."""
    from etl_project_spark.operators.multimodal import (
        Y4M_FSZ,
        Y4M_PLANE,
        Y4M_SAMPLE_EVERY,
        Y4M_FRAMES,
        Y4M_STREAM,
    )
    from etl_project_spark.registry import get

    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in get("mm7_video_frame_stats").fn(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs[:50]:
        raw = d["text"].encode()
        stream = (raw * (-(-Y4M_STREAM // len(raw))))[:Y4M_STREAM]
        for i in range(0, Y4M_FRAMES, Y4M_SAMPLE_EVERY):
            y = stream[i * Y4M_FSZ : i * Y4M_FSZ + Y4M_PLANE]
            r = got[(d["doc_id"], i)]
            assert r["max_luma"] == max(y)
            assert abs(r["mean_luma"] - sum(y) / Y4M_PLANE) < 1e-6


def test_documents_corpus_is_ascii(spark, sf_dir):
    """The mm6/mm7 payload builders treat utf-8 BYTES of text as
    samples while their DuckDB oracles operate on CHARACTERS
    (ord/substring) — parity rests on byte==char, i.e. ASCII. Pin the
    fixture assumption corpus-wide (the kernels also assert per-doc):
    any future non-ASCII regeneration fails here, not as a silent
    engine-vs-oracle divergence (r4 advice)."""
    from pyspark.sql import functions as F

    n = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.octet_length("text") != F.length("text"))
        .count()
    )
    assert n == 0


def test_streaming_perceptual_dedup_composes(spark, sf_dir, tmp_path):
    """Streaming media dedup is a COMPOSITION of shipped pieces, no new
    operator needed: ahash_signatures runs unchanged over a streaming
    frame (mapInPandas is streaming-capable), and dedup_stream keyed on
    the signature drops cross-batch perceptual duplicates within the
    watermark. A duplicate payload arriving in a LATER micro-batch must
    not survive."""
    import pyspark.sql.functions as F

    from etl_project_spark.operators.multimodal import (
        ahash_signatures,
        media_table,
    )
    from etl_project_spark.streaming import pipeline as sp

    m = media_table(spark, sf_dir).select("media_id", "payload").limit(50)
    base = m.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    # batch 2 re-sends the same payloads under new ids, 1 minute later
    dup = base.withColumn("media_id", F.col("media_id") + 100000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE")
    )
    src = str(tmp_path / "media_stream")
    base.write.parquet(src)
    dup.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = sp.file_event_stream(spark, src, schema, max_files_per_trigger=1)
    sigs = ahash_signatures(stream).join(
        stream.select("media_id", "ts"), "media_id"
    )
    out = sp.dedup_stream(sigs, keys=["ahash_bits"], watermark="1 hour")
    sp.run_available_now(
        out, str(tmp_path / "ck_mdd"), output_mode="append",
        queryName="media_dedup_test",
    )
    rows = spark.sql("SELECT * FROM media_dedup_test").collect()
    # only first-arrival signatures survive; every re-sent id is dropped
    assert rows, "stream produced nothing"
    assert all(r["media_id"] < 100000 for r in rows), rows[:5]
    n_batch_unique = (
        ahash_signatures(m).select("ahash_bits").distinct().count()
    )
    assert len({r["ahash_bits"] for r in rows}) == n_batch_unique


def test_shot_keyframes_partition_the_clip(spark, sf_dir):
    """per clip: shots tile the frame range exactly (contiguous ids
    from 0, frame spans abut, n_frames sums to the clip length), the
    keyframe is the lower-median of its shot, and the shot count is
    mm8's cut count + 1."""
    kf = mm.mm10_shot_keyframes(spark, sf_dir).collect()
    cuts: dict = {}
    for r in mm.mm8_scene_cuts(spark, sf_dir).collect():
        cuts[r.media_id] = cuts.get(r.media_id, 0) + int(r.is_cut)
    by_media: dict = {}
    for r in kf:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(cuts)
    for media_id, shots in by_media.items():
        shots.sort(key=lambda r: r.shot_id)
        assert [s.shot_id for s in shots] == list(range(len(shots)))
        assert len(shots) == cuts[media_id] + 1
        assert shots[0].start_frame == 0
        assert shots[-1].end_frame == mm.Y4M_FRAMES - 1
        for prev, nxt in zip(shots, shots[1:]):
            assert nxt.start_frame == prev.end_frame + 1
        for s in shots:
            assert s.n_frames == s.end_frame - s.start_frame + 1
            assert (
                s.keyframe_idx
                == s.start_frame + (s.n_frames - 1) // 2
            )
            assert 0.0 <= s.keyframe_mean_luma <= 255.0
