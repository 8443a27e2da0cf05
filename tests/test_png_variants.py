"""PNG static-coverage matrix: grayscale / gray+alpha / palette / 16-bit /
sub-byte depths / Adam7 interlace, decoded against a reference builder that
packs scanlines straight from the public spec (W3C PNG §7-8). The RGB8
sequential paths (all five filters) are covered in test_multimodal.py; this
file owns everything the round-4 generalization added."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from dedup.multimodal import _ADAM7, decode_image


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")


def _pack_rows(samples: np.ndarray, depth: int) -> bytes:
    """(h, w, ch) integer samples -> filtered (type 0) scanline bytes."""
    h, w, ch = samples.shape
    out = bytearray()
    for y in range(h):
        row = samples[y].reshape(-1)
        if depth == 16:
            # high byte carries the value; low byte deliberately nonzero
            # noise so a decoder reading the wrong byte fails the test
            line = b"".join(
                bytes([int(v) & 0xFF, (int(v) * 7 + 3) & 0xFF]) for v in row
            )
        elif depth == 8:
            line = row.astype(np.uint8).tobytes()
        else:  # 1/2/4-bit, MSB-first packing
            bits = ((row[:, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
            line = np.packbits(bits.astype(np.uint8)).tobytes()
        out += bytes([0]) + line
    return bytes(out)


def make_png(
    samples: np.ndarray,
    depth: int,
    color: int,
    interlace: int = 0,
    plte: np.ndarray | None = None,
) -> bytes:
    h, w = samples.shape[:2]
    if interlace == 0:
        raster = _pack_rows(samples, depth)
    else:
        raster = b"".join(
            _pack_rows(samples[y0::dy, x0::dx], depth)
            for x0, y0, dx, dy in _ADAM7
            if samples[y0::dy, x0::dx].size
        )
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, color, 0, 0, interlace])
    )
    png = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        png += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return png + _chunk(b"IDAT", zlib.compress(raster)) + _chunk(b"IEND", b"")


RNG = np.random.default_rng(11)


def test_grayscale8_replicates_channels():
    g = RNG.integers(0, 256, (5, 9, 1), dtype=np.uint8)
    out = decode_image(make_png(g, 8, 0))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))


def test_gray_alpha_drops_alpha():
    ga = RNG.integers(0, 256, (4, 6, 2), dtype=np.uint8)
    out = decode_image(make_png(ga, 8, 4))
    assert np.array_equal(out, np.repeat(ga[..., :1], 3, axis=2))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_grayscale_scales_to_full_range(depth):
    hi = (1 << depth) - 1
    g = RNG.integers(0, hi + 1, (3, 11, 1), dtype=np.uint8)
    out = decode_image(make_png(g, depth, 0))
    expect = np.repeat((g * (255 // hi)).astype(np.uint8), 3, axis=2)
    assert np.array_equal(out, expect)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_lookup(depth):
    n = 1 << depth
    plte = RNG.integers(0, 256, (min(n, 256), 3), dtype=np.uint8)
    idx = RNG.integers(0, plte.shape[0], (6, 7, 1), dtype=np.uint8)
    out = decode_image(make_png(idx, depth, 3, plte=plte))
    assert np.array_equal(out, plte[idx[..., 0]])


@pytest.mark.parametrize("color,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_depth16_keeps_high_byte(color, ch):
    s = RNG.integers(0, 256, (4, 5, ch), dtype=np.uint16)
    out = decode_image(make_png(s, 16, color))
    if color in (0, 4):
        expect = np.repeat(s[..., :1], 3, axis=2).astype(np.uint8)
    else:
        expect = s[..., :3].astype(np.uint8)
    assert np.array_equal(out, expect)


@pytest.mark.parametrize(
    "depth,color,plte_n",
    [(8, 2, 0), (8, 0, 0), (4, 3, 16), (16, 6, 0)],
)
def test_adam7_matches_sequential(depth, color, plte_n):
    """Interlaced and sequential encodings of the same image must decode
    byte-identically — including an 11x13 size that leaves some Adam7
    passes empty and others ragged."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    hi = (1 << min(depth, 8)) - 1 if color != 3 else plte_n - 1
    s = RNG.integers(0, hi + 1, (11, 13, ch)).astype(np.uint16)
    plte = (
        RNG.integers(0, 256, (plte_n, 3), dtype=np.uint8) if plte_n else None
    )
    seq = decode_image(make_png(s, depth, color, interlace=0, plte=plte))
    adam = decode_image(make_png(s, depth, color, interlace=1, plte=plte))
    assert np.array_equal(seq, adam)


def test_adam7_tiny_image_skips_empty_passes():
    s = RNG.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_image(make_png(s, 8, 2, interlace=1)),
        decode_image(make_png(s, 8, 2, interlace=0)),
    )


def test_filtered_rows_honor_non_rgb_bpp():
    """Sub filter at bpp=2 (gray+alpha): a decoder still assuming 3-byte
    pixels reconstructs garbage here."""
    ga = np.array([[[10, 200], [30, 100], [90, 50]]], dtype=np.uint8)  # 1x3x2
    raw = ga.reshape(-1)
    filt = bytearray([1])
    for x in range(raw.size):
        left = int(raw[x - 2]) if x >= 2 else 0
        filt.append((int(raw[x]) - left) & 0xFF)
    ihdr = (3).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 4, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(filt)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(png), np.repeat(ga[..., :1], 3, axis=2))


def test_invalid_combos_rejected():
    with pytest.raises(ValueError):  # 16-bit palette is illegal
        decode_image(make_png(np.zeros((2, 2, 1), np.uint16), 16, 3,
                              plte=np.zeros((2, 3), np.uint8)))
    with pytest.raises(ValueError):  # sub-byte RGB is illegal
        decode_image(make_png(np.zeros((2, 2, 3), np.uint8), 4, 2))
    with pytest.raises(ValueError):  # palette image without PLTE
        decode_image(make_png(np.zeros((2, 2, 1), np.uint8), 8, 3))


def test_png_variants_match_jvm_imageio(spark, tmp_path):
    """Independent-decoder conformance (same pattern as the JPEG/GIF
    suites): grayscale, paletted, and Adam7-interlaced files built by this
    suite's reference packer must decode byte-identically in JVM ImageIO
    and in dedup's decoder — PNG is lossless, so the comparison is exact."""
    jvm = spark.sparkContext._jvm
    cases = {
        "gray8": make_png(RNG.integers(0, 256, (9, 7, 1), dtype=np.uint8), 8, 0),
        "pal4": make_png(
            RNG.integers(0, 16, (8, 5, 1), dtype=np.uint8),
            4,
            3,
            plte=RNG.integers(0, 256, (16, 3), dtype=np.uint8),
        ),
        "rgb8_adam7": make_png(
            RNG.integers(0, 256, (11, 13, 3), dtype=np.uint8), 8, 2, interlace=1
        ),
        "gray2_adam7": make_png(
            RNG.integers(0, 4, (10, 6, 1), dtype=np.uint8), 2, 0, interlace=1
        ),
    }
    for name, png in cases.items():
        p = tmp_path / f"{name}.png"
        p.write_bytes(png)
        bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(str(p)))
        assert bi is not None, f"ImageIO rejected {name}"
        w, h = bi.getWidth(), bi.getHeight()
        mine = decode_image(png)
        if name.startswith("gray"):
            # getRGB would gamma-map the linear-gray colorspace to sRGB;
            # compare raw raster samples instead (the stored PNG values).
            # Sub-byte gray comes back as raw indices — rescale like the
            # decoder does.
            samp = np.array(
                bi.getRaster().getSamples(0, 0, w, h, 0, None), dtype=np.int64
            ).reshape(h, w)
            depth = 2 if name == "gray2_adam7" else 8
            ref1 = (samp * (255 // ((1 << depth) - 1))).astype(np.uint8)
            assert np.array_equal(mine, np.repeat(ref1[..., None], 3, axis=2)), name
        else:
            argb = np.array(
                bi.getRGB(0, 0, w, h, None, 0, w), dtype=np.int64
            ).reshape(h, w)
            ref = np.stack(
                [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF], axis=2
            ).astype(np.uint8)
            assert np.array_equal(mine, ref), name
