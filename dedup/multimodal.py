"""Multimodal column plumbing: image/audio/video payloads as opaque
`binary` columns with typed metadata, processed via Arrow-batched
mapInPandas.

The decode/feature-extraction kernels are STUBS in this environment (no
image/audio libraries in the container): `decode_image` raises
NotImplementedError unless a deterministic fake decoder is requested. The
Spark-side plumbing — schema, partitioning, UDF signatures, batch shapes —
is real and tested (tests/test_multimodal.py): swapping in a real decoder is
a one-function change that does not touch the distributed plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 64

_FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, sha256 string, "
    "feature array<float>"
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 array.

    Real decoding needs an image library (PIL/cv2 — absent here). With
    ``fake=True`` a deterministic pseudo-decode derives pixels from the
    payload hash so the downstream plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/cv2; not available in this container"
        )
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)


def extract_feature(pixels: np.ndarray) -> np.ndarray:
    """FEATURE_DIM-dim embedding stand-in: per-channel histograms —
    deterministic, cheap, and shaped exactly like a real model output."""
    chans = [
        np.histogram(pixels[..., c], bins=FEATURE_DIM // 3, range=(0, 256))[0]
        for c in range(3)
    ]
    v = np.concatenate(chans + [np.zeros(FEATURE_DIM - 3 * (FEATURE_DIM // 3))])
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def featurize_media(media: DataFrame, partitions: int = 32, fake_decode: bool = True) -> DataFrame:
    """(media rows) -> (media_id, kind, n_bytes, sha256, feature).

    Arrow batches of binary payloads stream through mapInPandas; explicit
    repartition spreads decode (CPU-bound) across cores regardless of input
    file layout — same pattern as text feature extraction.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                feats.append(extract_feature(decode_image(b, fake=fake_decode)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].reset_index(drop=True),
                    "kind": pdf["kind"].reset_index(drop=True),
                    "n_bytes": pd.array(sizes, dtype="int64"),
                    "sha256": shas,
                    "feature": feats,
                }
            )

    return (
        media.repartition(partitions, "media_id")
        .mapInPandas(run, _FEATURES_SCHEMA)
    )


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Exact payload dedup by content hash — the reference's hash-lookup
    semantics applied to binary media."""
    reps = features.groupBy("sha256").agg(F.min("media_id").alias("media_rep"))
    return features.join(reps, "sha256").select("media_id", "media_rep")


def gen_fake_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads) for tests —
    every row i ≡ 0 (mod 10), i >= 10, duplicates the payload of row i-5
    (planted exact dups)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                src = i - 5 if (i % 10 == 0 and i >= 10) else i
                payload = hashlib.sha256(f"{seed}:{src}".encode()).digest() * 4
                rows.append(
                    (f"m{i:06d}", "image", payload, "image/fake", 8, 8, None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime", "width", "height",
                    "duration_ms",
                ],
            )

    return spark.range(0, n, 1, 8).mapInPandas(gen, MEDIA_SCHEMA)
