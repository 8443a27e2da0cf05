"""Multimodal plumbing tests: binary payload schema, mapInPandas decode
pipeline (deterministic fake decoder), exact media dedup."""

from __future__ import annotations

import numpy as np
import pytest

from dedup.multimodal import (
    MEDIA_SCHEMA,
    FEATURE_DIM,
    decode_image,
    exact_media_dedup,
    extract_feature,
    featurize_media,
    gen_fake_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_fake_decode_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a.shape == (8, 8, 3) and np.array_equal(a, b)
    assert not np.array_equal(a, decode_image(b"other", fake=True))


def test_feature_shape_and_norm():
    f = extract_feature(decode_image(b"x", fake=True))
    assert f.shape == (FEATURE_DIM,) and f.dtype == np.float32
    assert abs(float(np.linalg.norm(f)) - 1.0) < 1e-5


def test_media_pipeline_and_exact_dedup(spark):
    media = gen_fake_media(spark, 50)
    assert media.schema == MEDIA_SCHEMA
    feats = featurize_media(media, partitions=4)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    # planted dups: every 5th row (>=5) duplicates row i-5
    dedup = {r["media_id"]: r["media_rep"] for r in exact_media_dedup(feats).collect()}
    assert dedup["m000010"] == dedup["m000005"]
    assert dedup["m000007"] != dedup["m000002"]
    # identical payloads -> identical features (determinism across workers)
    by_id = {r["media_id"]: list(r["feature"]) for r in rows}
    assert by_id["m000010"] == by_id["m000005"]
