"""Multimodal column plumbing: image/audio/video payloads as opaque
`binary` columns with typed metadata, processed via Arrow-batched
mapInPandas.

`decode_image` really decodes, pure numpy/stdlib: PPM (P6, 8/16-bit), BMP
(24/32-bit true color, 8-bit paletted plain or RLE8), PNG with full static
coverage (color types 0/2/3/4/6, depths 1/2/4/8/16, sequential and Adam7
interlaced — stdlib zlib inflate + the five public scanline filters),
baseline, progressive, and arithmetic-coded JPEG (dedup/jpeg.py +
dedup/jpeg_arith.py), GIF87a/89a (dedup/gif.py),
lossless WebP/VP8L (dedup/webp.py), and lossy WebP/VP8 keyframes
(dedup/vp8.py, bit-exact YUV vs the system libwebp). A deterministic fake
decoder stays available for synthetic fixtures. The Spark-side plumbing — schema, partitioning,
UDF signatures, batch shapes — is real and tested
(tests/test_multimodal.py): swapping in a codec library is a one-function
change that does not touch the distributed plan.
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


def _decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6): ASCII header (with # comments), one whitespace
    byte, then raw RGB rows — 1-byte samples for maxval <= 255, big-endian
    2-byte samples for 256..65535 (rescaled to 8-bit)."""
    pos, tokens = 0, []
    while len(tokens) < 4:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        tokens.append(b[start:pos])
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    pos += 1  # exactly one whitespace byte separates header and raster
    if maxval > 255:
        wide = np.frombuffer(b, ">u2", count=w * h * 3, offset=pos).reshape(h, w, 3)
        return ((wide.astype(np.uint32) * 255 + maxval // 2) // maxval).astype(
            np.uint8
        )
    return np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def _bmp_rle8_rows(data: bytes, w: int, h: int) -> np.ndarray:
    """RLE8 escape-coded pixel stream -> (h, w) palette-index rows in
    file (bottom-up) order."""
    rows = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            end = min(x + cnt, w)
            rows[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val literal bytes, padded to 16-bit
            end = min(x + val, w)
            rows[y, x:end] = np.frombuffer(data, np.uint8, count=end - x, offset=i)
            x = end
            i += val + (val & 1)
    return rows


def _bmp_rle4_rows(data: bytes, w: int, h: int) -> np.ndarray:
    """RLE4 escape-coded pixel stream -> (h, w) palette-index rows in
    file (bottom-up) order. Same escape grammar as RLE8, but an encoded
    run alternates the byte's two nibbles and absolute mode packs two
    pixels per byte (then pads the byte count to a 16-bit boundary)."""
    rows = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run: hi, lo, hi, lo, ...
            end = min(x + cnt, w)
            pair = np.array([val >> 4, val & 15], dtype=np.uint8)
            rows[y, x:end] = np.tile(pair, (cnt + 1) // 2)[: end - x]
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val literal pixels, byte count word-padded
            nbytes = (val + 1) // 2
            packed = np.frombuffer(data, np.uint8, count=nbytes, offset=i)
            nib = np.empty(nbytes * 2, dtype=np.uint8)
            nib[0::2] = packed >> 4
            nib[1::2] = packed & 15
            end = min(x + val, w)
            rows[y, x:end] = nib[: end - x]
            x = end
            i += nbytes + (nbytes & 1)
    return rows


def _decode_bmp(b: bytes) -> np.ndarray:
    """BMP (BITMAPINFOHEADER, bottom-up or top-down): uncompressed
    16/24/32-bit true color (16-bit as X1R5G5B5 or BI_BITFIELDS masks),
    1/4/8-bit paletted — plain, RLE8-, or RLE4-compressed — and
    BI_JPEG/BI_PNG passthrough (the pixel-data region is a complete
    embedded JPEG/PNG stream, decoded by this repo's own codecs)."""
    if len(b) < 54:
        raise ValueError("truncated BMP")
    off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    ah = abs(h)
    if comp in (4, 5):  # BI_JPEG / BI_PNG: pixel data IS an embedded stream
        # Per the public BITMAPINFOHEADER contract these exist for
        # passthrough; biSizeImage holds the stream length (0 -> rest of
        # file). The embedded image carries its own orientation, so no
        # bottom-up flip applies.
        size_image = int.from_bytes(b[34:38], "little")
        stream = bytes(b[off : off + size_image] if size_image else b[off:])
        if comp == 4:
            from .jpeg import decode_baseline_jpeg

            return decode_baseline_jpeg(stream)
        return _decode_png(stream)
    if bpp in (1, 4, 8) and comp in (0, 1, 2):
        n_colors = int.from_bytes(b[46:50], "little") or (1 << bpp)
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            b, np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        if comp == 1:  # RLE8 (always bottom-up)
            if bpp != 8:
                raise ValueError("BI_RLE8 requires 8-bit pixels")
            idx = _bmp_rle8_rows(b[off:], w, ah)
        elif comp == 2:  # RLE4 (always bottom-up)
            if bpp != 4:
                raise ValueError("BI_RLE4 requires 4-bit pixels")
            idx = _bmp_rle4_rows(b[off:], w, ah)
        else:
            stride = ((w * bpp + 31) // 32) * 4  # rows pad to 32 bits
            rows = np.frombuffer(
                b, np.uint8, count=stride * ah, offset=off
            ).reshape(ah, stride)
            if bpp == 8:
                idx = rows[:, :w]
            elif bpp == 4:
                nib = np.empty((ah, stride * 2), dtype=np.uint8)
                nib[:, 0::2] = rows >> 4
                nib[:, 1::2] = rows & 15
                idx = nib[:, :w]
            else:  # 1-bit: MSB-first within each byte
                idx = np.unpackbits(rows, axis=1)[:, :w]
        img = pal[idx]
        return img[::-1] if h > 0 else img
    if bpp == 16 and comp in (0, 3):
        if comp == 3:  # BI_BITFIELDS: three LE masks follow the info header
            masks = [
                int.from_bytes(b[54 + 4 * i : 58 + 4 * i], "little") for i in range(3)
            ]
        else:  # default 16-bit layout is X1R5G5B5
            masks = [0x7C00, 0x03E0, 0x001F]
        stride = ((w * 2 + 3) // 4) * 4
        rows = np.frombuffer(b, np.uint8, count=stride * ah, offset=off).reshape(
            ah, stride
        )
        px = rows[:, : w * 2].reshape(ah, w, 2).astype(np.uint16)
        v = px[..., 0] | (px[..., 1] << 8)  # little-endian 16-bit words
        chans = []
        for m in masks:
            shift = (m & -m).bit_length() - 1 if m else 0
            span = m >> shift
            c = (v >> shift) & span
            # scale to 0..255 with rounding; span==0 -> all-zero channel
            chans.append(
                ((c.astype(np.uint32) * 255 + span // 2) // span).astype(np.uint8)
                if span
                else np.zeros_like(v, dtype=np.uint8)
            )
        img = np.dstack(chans)
        return img[::-1] if h > 0 else img
    if bpp in (24, 32) and comp in (0, 3):
        nb = bpp // 8
        stride = ((w * nb + 3) // 4) * 4
        rows = np.frombuffer(b, np.uint8, count=stride * ah, offset=off).reshape(
            ah, stride
        )[:, : w * nb]
        img = rows.reshape(ah, w, nb)[..., :3][..., ::-1]  # BGR(A) -> RGB
        return img[::-1] if h > 0 else img
    raise NotImplementedError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")


def _png_chunks(b: bytes):
    pos = 8  # past the 8-byte signature
    while pos + 8 <= len(b):
        length = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x0, y0, dx, dy) per the public PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, h: int, stride: int, bpp: int):
    """Reconstruct `h` scanlines of `stride` bytes each from the filtered
    stream at `off` (each line prefixed by its filter-type byte); returns
    (rows ndarray (h, stride) uint8, next offset). `bpp` is the filter
    pixel width in BYTES (max(1, channels*depth/8) per the spec)."""
    need = h * (stride + 1)
    if len(raw) - off < need:
        raise ValueError("truncated PNG raster")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intc)
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1).astype(
            np.intc
        )
        off += stride + 1
        if ftype == 0:
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-sequential
            recon = line.copy()
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                bb = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + bb) >> 1
                else:  # Paeth predictor
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                recon[x] = (recon[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon
        prev = recon.astype(np.intc)
    return out, off


def _png_expand(rows: np.ndarray, w: int, depth: int, color: int, plte) -> np.ndarray:
    """(h, stride) reconstructed scanline bytes -> (h, w, 3) uint8 RGB for
    one (sub-)image: bit-unpack depths 1/2/4, drop the low byte of 16-bit
    samples, look up PLTE for palette images, replicate grayscale."""
    h = rows.shape[0]
    ch = _PNG_CHANNELS[color]
    if depth == 16:
        samples = rows.reshape(h, w, ch, 2)[..., 0]  # big-endian high byte
    elif depth == 8:
        samples = rows.reshape(h, w, ch)
    else:  # 1/2/4-bit grayscale or palette indices, packed MSB-first
        bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        samples = (bits * weights).sum(axis=2, dtype=np.uint16)[..., None]
        if color == 0:  # scale sub-byte gray to full range
            samples = samples * (255 // ((1 << depth) - 1))
        samples = samples.astype(np.uint8)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE chunk")
        return plte[samples[..., 0]]
    if color in (0, 4):  # grayscale (+alpha dropped)
        return np.repeat(samples[..., :1], 3, axis=2).astype(np.uint8)
    return samples[..., :3].astype(np.uint8).copy()  # RGB / RGBA


def _decode_png(b: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + per-scanline filter
    reconstruction per the public W3C PNG spec / RFC 2083), full static
    coverage: color types 0/2/3/4/6, bit depths 1/2/4/8/16, interlace 0
    (sequential) and 1 (Adam7). No image library needed — IDAT is DEFLATE,
    the five scanline filters are integer arithmetic, and Adam7 is seven
    independently-filtered sub-images re-scattered onto the pixel grid.
    16-bit samples keep the high byte (the 8-bit view every downstream
    feature in this engine consumes); alpha is dropped; tRNS ignored for
    the same reason. APNG animation chunks (acTL/fcTL/fdAT) are ancillary
    and skipped — the decode yields the default (first) image."""
    import zlib

    ihdr = None
    plte = None
    parts = []
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            parts.append(data)
    if ihdr is None or not parts:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    if color not in _PNG_CHANNELS or interlace not in (0, 1):
        raise ValueError(f"corrupt PNG header (color={color}, interlace={interlace})")
    if (
        depth not in (1, 2, 4, 8, 16)
        or (depth < 8 and color not in (0, 3))
        or (depth == 16 and color == 3)
    ):
        raise ValueError(f"invalid PNG depth/color combo ({depth}, {color})")
    ch = _PNG_CHANNELS[color]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(b"".join(parts))

    def stride_of(width: int) -> int:
        return (width * ch * depth + 7) // 8

    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, h, stride_of(w), bpp)
        return _png_expand(rows, w, depth, color, plte)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue  # empty pass for small images
        rows, off = _png_unfilter(raw, off, ph, stride_of(pw), bpp)
        out[y0::dy, x0::dx] = _png_expand(rows, pw, depth, color, plte)
    return out


def encode_png(pixels: np.ndarray, filter_type: int = 4) -> bytes:
    """Minimal PNG encoder (RGB8, one filter type for all rows) for
    fixtures/round-trip tests — exercises the decoder's filter
    reconstruction, not just the None path."""
    import zlib

    h, w, _ = pixels.shape
    px = pixels.astype(np.intc)
    rows = []
    prev = np.zeros((w, 3), dtype=np.intc)
    for y in range(h):
        cur = px[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        elif filter_type == 4:
            left = np.vstack([np.zeros((1, 3), np.intc), cur[:-1]])
            up = prev
            ul = np.vstack([np.zeros((1, 3), np.intc), prev[:-1]])
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            filt = (cur - pred) & 0xFF
        else:
            raise ValueError("encoder supports filter types 0, 2, 4")
        rows.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur
    raster = zlib.compress(b"".join(rows))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raster)
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 uint8 array.

    Real decode paths (all pure numpy/stdlib — see the module docstring for
    the per-format variant matrix): PPM, BMP, PNG, JPEG, GIF, WebP
    (lossless and lossy), TIFF. ``fake=True`` derives deterministic pixels
    from the payload hash for synthetic fixtures whose payloads are not
    real images.
    """
    if fake:
        seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    b = payload or b""
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_baseline_jpeg

        # pure-numpy decoder (jpeg.py): baseline/progressive Huffman agrees
        # with the JVM ImageIO reference to <1 mean abs level on real
        # photos; arithmetic (SOF9/SOF10) routes to jpeg_arith.py, verified
        # coefficient-exact against libjpeg; hierarchical raises inside
        return decode_baseline_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        # pure-stdlib/numpy LZW decoder (gif.py): verified both ways
        # against the JVM ImageIO reference; stills composite frame 1
        return decode_gif(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from .webp import decode_webp

        # pure-stdlib/numpy decoders: VP8L (webp.py, RFC 9649 — full
        # lossless stream) and lossy VP8 keyframes (vp8.py, RFC 6386 —
        # YUV surface verified bit-exact against the system libwebp)
        return decode_webp(b)[:, :, :3]
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        # pure-stdlib/numpy baseline-TIFF decoder (tiff.py): strips/tiles,
        # chunky/planar, none/LZW/Deflate/PackBits + predictor, verified
        # both ways against the JVM ImageIO TIFF plugin
        return decode_tiff(b)
    raise NotImplementedError(
        "remaining formats require PIL/cv2 (unavailable in this "
        "container); supported here: PPM, BMP, PNG (all static variants), "
        "JPEG (baseline/progressive/arithmetic/lossless), GIF, WebP "
        "(lossless VP8L and lossy VP8), TIFF (baseline)"
    )


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Inverse of _decode_ppm for fixtures/round-trip tests."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


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


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy fancy-indexing (vectorized, no
    per-pixel Python). Center-aligned sampling (the standard 'pixel is a
    cell, sample its center' mapping), so upscale/downscale round-trips of
    integer factors are exact."""
    h, w = pixels.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return pixels[rows[:, None], cols[None, :]]


def resize_media(
    media: DataFrame,
    out_h: int,
    out_w: int,
    partitions: int = 32,
    fake_decode: bool = True,
) -> DataFrame:
    """decode -> nearest-neighbor resize -> re-encode (PPM) each payload;
    schema-preserving, so the output feeds the same featurize/dedup ops.
    Same mapInPandas batch shape as featurize_media: payload bytes cross
    the Arrow boundary once per batch, resize is one numpy gather."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                px = resize_nearest(decode_image(b, fake=fake_decode), out_h, out_w)
                payloads.append(encode_ppm(px))
            out = pdf.copy()
            out["payload"] = payloads
            out["mime"] = "image/x-portable-pixmap"
            out["width"] = pd.array([out_w] * len(pdf), dtype="Int32")
            out["height"] = pd.array([out_h] * len(pdf), dtype="Int32")
            yield out

    return media.repartition(partitions, "media_id").mapInPandas(run, MEDIA_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frames", T.ArrayType(T.BinaryType()), False),
    ]
)


def sample_frames(videos: DataFrame, every_k: int) -> DataFrame:
    """(media_id, frames: array<binary>) -> (media_id, frame_idx, payload),
    keeping every k-th frame (frame 0 always kept).

    The sampling itself is pure JVM — posexplode + a modulo filter inside
    whole-stage codegen — so unsampled frame bytes are DROPPED before any
    Python/Arrow boundary; only the kept frames ever cross into decode
    (multimodal.featurize_media / resize_media on the exploded rows). At
    100 TB of video this ordering — prune in the JVM, decode after — is the
    difference between shipping 1/k of the bytes to Python and shipping all
    of them."""
    return (
        videos.select(
            "media_id", F.posexplode("frames").alias("frame_idx", "payload")
        )
        .filter(F.col("frame_idx") % every_k == 0)
    )


def gen_fake_video(
    spark: SparkSession, n: int, n_frames: int = 12, seed: int = 42
) -> DataFrame:
    """Deterministic synthetic 'video' table: each row is an array of
    encoded PPM frames (4x4 gradients keyed by (id, frame))."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                frames = []
                for fidx in range(n_frames):
                    base = (seed * 31 + i * 7 + fidx * 13) % 200
                    px = (
                        base
                        + np.add.outer(np.arange(4), np.arange(4))[..., None]
                        + np.arange(3)[None, None, :]
                    ).astype(np.uint8)
                    frames.append(encode_ppm(px))
                rows.append((f"v{i:06d}", frames))
            yield pd.DataFrame(rows, columns=["media_id", "frames"])

    return spark.range(0, n, 1, 4).mapInPandas(gen, FRAMES_SCHEMA)
