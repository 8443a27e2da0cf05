"""Audio as an opaque binary column: stdlib WAV (RIFF PCM) decode +
Arrow-batched feature extraction (the training-data-pipeline media ops the
brief lists alongside image decode; reference scope per SURVEY.md §2 —
multimodal payloads ride the same plumbing as documents).

Design mirrors `multimodal.featurize_media`: payloads stay opaque `binary`
in the DataFrame, decode runs JVM→Arrow→numpy inside `mapInPandas` (one
batch of payloads per Arrow chunk, no row-at-a-time Python), and the exact
dedup on content hash reuses the hash-groupBy shape. Real decode paths:
WAV (integer/float PCM, G.711, IMA ADPCM — this module) and FLAC
(`dedup.flac`, pure stdlib/numpy). Perceptual codecs (mp3/ogg-vorbis)
need external libs this container doesn't ship — they raise
NotImplementedError at the same guarded branch a real deployment would
plug a decoder into.
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

_INT_RANGE = {1: 128.0, 2: 32768.0, 3: 8388608.0, 4: 2147483648.0}


def _riff_chunks(b: bytes) -> dict[bytes, bytes]:
    """RIFF/WAVE container -> {chunk id: payload} (first occurrence wins)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    chunks: dict[bytes, bytes] = {}
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        chunks.setdefault(cid, b[i + 8 : i + 8 + size])
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return chunks


# G.711 companding: build the 256-entry decode tables once (pure spec math,
# no deprecated stdlib audioop dependency in product code)
def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    ulaw = np.empty(256, dtype=np.int16)
    for u in range(256):
        v = ~u & 0xFF
        exp = (v >> 4) & 7
        mant = v & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        ulaw[u] = -mag if v & 0x80 else mag
    alaw = np.empty(256, dtype=np.int16)
    for a in range(256):
        v = a ^ 0x55
        exp = (v >> 4) & 7
        mant = v & 0x0F
        mag = ((mant << 4) + 0x108) << (exp - 1) if exp else (mant << 4) + 8
        # A-law sign bit is the inverse of mu-law's: set (after the 0x55
        # toggle) means POSITIVE (G.711 table 2)
        alaw[a] = mag if v & 0x80 else -mag
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()

# IMA/DVI ADPCM tables (public spec)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_nibbles(
    nibbles, pred: int, index: int
) -> tuple[list[int], int, int]:
    """Core IMA ADPCM nibble loop (ITU/IMA reference algorithm); returns
    (samples, final predictor, final step index)."""
    out = []
    for nib in nibbles:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib & 7])))
        out.append(pred)
    return out, pred, index


def _decode_ima_adpcm(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM 'data' chunk -> int16 samples shaped (n, ch). Each block:
    per-channel 4-byte header (int16 predictor = first output sample, step
    index, reserved), then interleaved 4-byte nibble groups — low nibble
    first, 8 samples per group per channel, groups round-robin across
    channels."""
    frames: list[np.ndarray] = []
    for off in range(0, len(data) - (len(data) % block_align), block_align):
        block = data[off : off + block_align]
        chans: list[list[int]] = []
        preds: list[int] = []
        idxs: list[int] = []
        for c in range(ch):
            pred = int.from_bytes(block[c * 4 : c * 4 + 2], "little", signed=True)
            preds.append(pred)
            idxs.append(min(88, max(0, block[c * 4 + 2])))
            chans.append([pred])
        body = block[ch * 4 :]
        pos = 0
        while pos + 4 * ch <= len(body):
            for c in range(ch):
                quad = body[pos + c * 4 : pos + c * 4 + 4]
                nibs = []
                for byte in quad:
                    nibs.append(byte & 0x0F)
                    nibs.append(byte >> 4)
                decoded, preds[c], idxs[c] = _ima_decode_nibbles(
                    nibs, preds[c], idxs[c]
                )
                chans[c].extend(decoded)
            pos += 4 * ch
        n = min(len(c) for c in chans)
        frames.append(
            np.stack([np.asarray(c[:n], dtype=np.int16) for c in chans], axis=1)
        )
    if not frames:
        return np.zeros((0, ch), dtype=np.int16)
    return np.concatenate(frames, axis=0)


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float samples in [-1, 1] shaped (n, channels),
    sample_rate).

    Real decode paths, all pure stdlib/numpy: integer PCM (8/16/24/32-bit),
    IEEE float (format 3), G.711 mu-law (7) and A-law (6), and IMA/DVI
    ADPCM (0x11) including multi-channel block interleave — i.e. the
    compressed WAV variants actually seen in telephony/telemetry dumps.
    FLAC payloads take the `dedup.flac` path via `decode_audio`;
    perceptual codecs (mp3/ogg-vorbis) still need an external library."""
    chunks = _riff_chunks(b)
    fmt = chunks.get(b"fmt ")
    data = chunks.get(b"data")
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _brate, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    ch = max(1, ch)
    if tag == 1:  # integer PCM — keep the battle-tested stdlib path
        with wave.open(io.BytesIO(b), "rb") as w:
            ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(w.getnframes())
        if width not in _INT_RANGE:
            raise NotImplementedError(f"{width * 8}-bit PCM not supported")
        if width == 1:  # WAV 8-bit is unsigned
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        elif width == 3:  # 24-bit packed little-endian signed
            u = np.frombuffer(raw, dtype=np.uint8)
            u = u[: len(u) - len(u) % 3].reshape(-1, 3).astype(np.int32)
            v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
            x = (v - ((v & 0x800000) << 1)).astype(np.float64)  # sign-extend
        else:
            dt = np.int16 if width == 2 else np.int32
            x = np.frombuffer(raw, dtype=dt).astype(np.float64)
        return (x / _INT_RANGE[width]).reshape(-1, ch), rate
    if tag == 3:  # IEEE float
        dt = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(data[: len(data) - len(data) % (np.dtype(dt).itemsize * ch)], dtype=dt)
        return np.clip(x.astype(np.float64), -1.0, 1.0).reshape(-1, ch), rate
    if tag == 7:  # G.711 mu-law
        x = _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(np.float64)
        return (x / 32768.0)[: (len(x) // ch) * ch].reshape(-1, ch), rate
    if tag == 6:  # G.711 A-law
        x = _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)].astype(np.float64)
        return (x / 32768.0)[: (len(x) // ch) * ch].reshape(-1, ch), rate
    if tag == 0x11:  # IMA/DVI ADPCM
        x = _decode_ima_adpcm(data, ch, block_align).astype(np.float64)
        return x / 32768.0, rate
    raise NotImplementedError(
        f"WAV format tag 0x{tag:x} not supported (PCM/float/mu-law/A-law/"
        "IMA-ADPCM are; perceptual codecs need an external library)"
    )


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


def _wav_container(
    tag: int,
    ch: int,
    rate: int,
    bits: int,
    block_align: int,
    data: bytes,
    n_samples: int,
) -> bytes:
    """Minimal RIFF writer for non-PCM formats (18-byte fmt + fact chunk)."""
    fmt = struct.pack(
        "<HHIIHHH", tag, ch, rate, rate * block_align if tag == 0x11 else rate * ch * bits // 8, block_align, bits, 0
    )
    fact = struct.pack("<I", n_samples)
    body = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + len(fact).to_bytes(4, "little") + fact
        + b"data" + len(data).to_bytes(4, "little") + data + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def _compand(x: np.ndarray, table: np.ndarray) -> np.ndarray:
    """int16 -> 8-bit code by nearest decoded value (the optimal quantizer
    for the given decode table — consistent with decode by construction)."""
    order = np.argsort(table)
    sorted_vals = table[order].astype(np.int64)
    pos = np.searchsorted(sorted_vals, x)
    pos = np.clip(pos, 1, len(sorted_vals) - 1)
    left = sorted_vals[pos - 1]
    right = sorted_vals[pos]
    pick = np.where(np.abs(x - left) <= np.abs(right - x), pos - 1, pos)
    return order[pick].astype(np.uint8)


def _to_int16(samples: np.ndarray) -> np.ndarray:
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    return np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int64), x.shape[1]


def encode_wav_mulaw(samples: np.ndarray, rate: int) -> bytes:
    pcm, ch = _to_int16(samples)
    codes = _compand(pcm.reshape(-1), _ULAW_TABLE)
    return _wav_container(7, ch, rate, 8, ch, codes.tobytes(), pcm.shape[0])


def encode_wav_alaw(samples: np.ndarray, rate: int) -> bytes:
    pcm, ch = _to_int16(samples)
    codes = _compand(pcm.reshape(-1), _ALAW_TABLE)
    return _wav_container(6, ch, rate, 8, ch, codes.tobytes(), pcm.shape[0])


def _ima_encode_channel(x: np.ndarray, pred: int, index: int) -> tuple[list[int], int, int]:
    nibs = []
    for s in x:
        step = int(_IMA_STEPS[index])
        diff = int(s) - pred
        nib = 8 if diff < 0 else 0
        diff = abs(diff)
        vpdiff = step >> 3
        if diff >= step:
            nib |= 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            nib |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            nib |= 1
            vpdiff += step
        pred = pred - vpdiff if nib & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib & 7])))
        nibs.append(nib)
    return nibs, pred, index


def encode_wav_ima_adpcm(
    samples: np.ndarray, rate: int, groups_per_block: int = 8
) -> bytes:
    """float [-1,1] (n,) or (n,ch) -> IMA ADPCM WAV (mono/stereo tested).
    samples-per-block = 1 + 8*groups_per_block per channel; the last block
    is padded by repeating the final sample."""
    pcm, ch = _to_int16(samples)
    spb = 1 + 8 * groups_per_block
    block_align = 4 * ch + 4 * groups_per_block * ch
    n = pcm.shape[0]
    out = bytearray()
    idxs = [0] * ch
    for start in range(0, n, spb):
        blk = pcm[start : start + spb]
        if blk.shape[0] < spb:  # pad by repeating the last sample
            blk = np.vstack([blk, np.repeat(blk[-1:], spb - blk.shape[0], axis=0)])
        chan_nibs = []
        for c in range(ch):
            pred = int(blk[0, c])
            out_hdr = struct.pack("<hBB", pred, idxs[c], 0)
            nibs, _, idxs[c] = _ima_encode_channel(blk[1:, c], pred, idxs[c])
            chan_nibs.append((out_hdr, nibs))
        for hdr, _ in chan_nibs:
            out.extend(hdr)
        for g in range(groups_per_block):
            for c in range(ch):
                nibs = chan_nibs[c][1][g * 8 : g * 8 + 8]
                for k in range(0, 8, 2):
                    out.append(nibs[k] | (nibs[k + 1] << 4))
    return _wav_container(0x11, ch, rate, 4, block_align, bytes(out), n)


def decode_audio(payload: bytes, fake: bool = False) -> tuple[np.ndarray, int]:
    """Dispatch on container magic. `fake` derives deterministic samples
    from the payload hash (CI-safe pipeline plumbing without a codec)."""
    if fake:
        h = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(struct.unpack("<Q", h[:8])[0])
        return rng.standard_normal((256, 1)) * 0.1, 16000
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(payload)
    raise NotImplementedError(
        "perceptual audio (mp3/ogg-vorbis) needs an external codec; "
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
