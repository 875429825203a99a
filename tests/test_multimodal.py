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
