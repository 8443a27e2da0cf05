"""Audio as an opaque binary column: stdlib WAV (RIFF PCM) decode +
Arrow-batched feature extraction (the training-data-pipeline media ops the
brief lists alongside image decode; reference scope per SURVEY.md §2 —
multimodal payloads ride the same plumbing as documents).

Design mirrors `multimodal.featurize_media`: payloads stay opaque `binary`
in the DataFrame, decode runs JVM→Arrow→numpy inside `mapInPandas` (one
batch of payloads per Arrow chunk, no row-at-a-time Python), and the exact
dedup on content hash reuses the hash-groupBy shape. Compressed codecs
(mp3/ogg/flac) need external libs this container doesn't ship — they raise
NotImplementedError at the same guarded branch a real deployment would
plug a decoder into; PCM WAV decode is real and round-trip-tested.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

AUDIO_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "sample_rate int, duration_ms int"
)

_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, sha256 string, sample_rate int, "
    "n_channels int, n_samples long, duration_s double, rms double, "
    "peak double"
)

_INT_RANGE = {1: 128.0, 2: 32768.0, 4: 2147483648.0}


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float samples in [-1, 1] shaped (n, channels),
    sample_rate). stdlib only (`wave` + struct); 8/16/32-bit PCM."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(b), "rb") as w:
        ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width not in _INT_RANGE:
        raise NotImplementedError(f"{width * 8}-bit PCM not supported")
    if width == 1:  # WAV 8-bit is unsigned
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        dt = np.int16 if width == 2 else np.int32
        x = np.frombuffer(raw, dtype=dt).astype(np.float64)
    return (x / _INT_RANGE[width]).reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] shaped (n,) or (n, ch) -> 16-bit PCM WAV
    bytes (test fixture / round-trip counterpart of decode_wav)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(x.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes, fake: bool = False) -> tuple[np.ndarray, int]:
    """Dispatch on container magic. `fake` derives deterministic samples
    from the payload hash (CI-safe pipeline plumbing without a codec)."""
    if fake:
        h = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(struct.unpack("<Q", h[:8])[0])
        return rng.standard_normal((256, 1)) * 0.1, 16000
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "compressed audio (mp3/ogg/flac) needs an external codec; "
        "plug one in here or use fake=True for plumbing tests"
    )


def featurize_audio(
    media: DataFrame, partitions: int = 32, fake_decode: bool = True
) -> DataFrame:
    """(audio rows) -> (media_id, n_bytes, sha256, sample_rate, n_channels,
    n_samples, duration_s, rms, peak).

    Same scale shape as image featurization: explicit repartition spreads
    the CPU-bound decode across cores, payload bytes move JVM→Python once
    per Arrow batch, all stats vectorized numpy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "n_bytes", "sha256", "sample_rate", "n_channels",
                "n_samples", "duration_s", "rms", "peak",
            )}
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                out["n_bytes"].append(len(b))
                out["sha256"].append(hashlib.sha256(b).hexdigest())
                x, rate = decode_audio(b, fake=fake_decode)
                out["sample_rate"].append(rate)
                out["n_channels"].append(x.shape[1])
                out["n_samples"].append(x.shape[0])
                out["duration_s"].append(x.shape[0] / rate if rate else 0.0)
                out["rms"].append(float(np.sqrt(np.mean(x**2))) if x.size else 0.0)
                out["peak"].append(float(np.max(np.abs(x))) if x.size else 0.0)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].reset_index(drop=True), **out}
            )

    return media.repartition(partitions, "media_id").mapInPandas(
        run, _FEATURES_SCHEMA
    )


def exact_audio_dedup(features: DataFrame) -> DataFrame:
    """Exact payload dedup by content hash (same hash-lookup semantics as
    image/media dedup)."""
    reps = features.groupBy("sha256").agg(F.min("media_id").alias("media_rep"))
    return features.join(reps, "sha256").select("media_id", "media_rep")


def gen_fake_audio(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic audio table: real 16-bit PCM WAV payloads
    (sine bursts keyed by id); every row i ≡ 0 (mod 10), i >= 10 duplicates
    the payload of row i-5 (planted exact dups)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                src = i - 5 if (i % 10 == 0 and i >= 10) else i
                t = np.arange(800) / 8000.0
                freq = 220.0 + (src * 7919) % 1760
                payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), 8000)
                rows.append((f"a{i:06d}", "audio", payload, "audio/wav", 8000, 100))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime", "sample_rate",
                    "duration_ms",
                ],
            )

    return spark.range(0, n, 1, 8).mapInPandas(gen, AUDIO_SCHEMA)
