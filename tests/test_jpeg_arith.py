"""Arithmetic-coded JPEG (SOF9/SOF10) decoder verified against the system
libjpeg — the same oracle discipline as the VP8 decoder (libwebp shim) and
the Huffman JPEG paths (JVM ImageIO).

The strong check is coefficient-exact: libjpeg's arithmetic and Huffman
encodes of the same source at the same settings carry identical quantized
coefficients, so decode_baseline_jpeg(arith_bytes) must equal
decode_baseline_jpeg(huffman_bytes) byte for byte — any QM-coder register
drift, statistics-bin misindex, or conditioning-context error scrambles
coefficients and fails loudly. A looser pixel-proximity check against
libjpeg's own decode guards against a systematically-wrong-but-internally-
consistent pairing (IDCT realizations legitimately differ by a few levels).

All tests skip cleanly when gcc/jpeglib.h/libjpeg are unavailable.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import libjpeg_oracle as orc

pytestmark = pytest.mark.skipif(
    orc.shim() is None, reason="no gcc/jpeglib toolchain for the libjpeg oracle"
)


def _src(rng, shape, color):
    if color:
        return rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def _assert_arith_matches_huffman(src, **kw):
    from dedup.jpeg import decode_baseline_jpeg

    a = orc.encode(src, arith=True, **kw)
    h = orc.encode(src, arith=False, **{k: v for k, v in kw.items() if k != "conditioning"})
    assert (b"\xff\xc9" in a) or (b"\xff\xca" in a)  # really arithmetic SOF
    aa = decode_baseline_jpeg(a)
    ha = decode_baseline_jpeg(h)
    np.testing.assert_array_equal(aa, ha)


@pytest.mark.parametrize(
    "shape,color,prog,rst,h2v2,q",
    [
        ((8, 8), False, False, 0, False, 90),  # single MCU
        ((13, 21), False, False, 0, False, 50),  # partial edge blocks
        ((16, 16), True, False, 0, False, 90),  # 4:4:4 color sequential
        ((40, 56), True, False, 0, True, 75),  # 4:2:0 interleaved MCUs
        ((16, 16), False, True, 0, False, 90),  # progressive grayscale
        ((40, 56), True, True, 0, True, 85),  # progressive 4:2:0 (SA refines)
        ((24, 24), True, False, 2, False, 90),  # restart: coder+stats resets
        ((40, 56), True, True, 3, True, 60),  # restarts inside every scan kind
    ],
)
def test_arith_decode_is_coefficient_exact(shape, color, prog, rst, h2v2, q):
    rng = np.random.default_rng(hash((shape, color, prog, rst, h2v2, q)) & 0xFFFF)
    _assert_arith_matches_huffman(
        _src(rng, shape, color), quality=q, progressive=prog, restart=rst, h2v2=h2v2
    )


@pytest.mark.parametrize("cond", [(2, 3, 1), (1, 2, 10), (0, 4, 63), (3, 5, 2)])
@pytest.mark.parametrize("prog", [False, True])
def test_arith_nondefault_dac_conditioning(cond, prog):
    """DAC L/U bound the DC context classifier and Kx selects the AC
    magnitude-chain statistics area (T.81 Tables F.4/F.5) — exercised with
    values libjpeg never emits by default."""
    rng = np.random.default_rng(cond[0] * 100 + cond[1] * 10 + cond[2])
    _assert_arith_matches_huffman(
        _src(rng, (24, 29), True), quality=85, progressive=prog, conditioning=cond
    )


def test_arith_decode_pixels_close_to_libjpeg_itself():
    """Cross-check the pairing itself: our arithmetic decode must sit within
    IDCT-realization distance of libjpeg's own pixel output."""
    from dedup.jpeg import decode_baseline_jpeg

    rng = np.random.default_rng(11)
    a = orc.encode(_src(rng, (32, 32), True), quality=90, arith=True)
    d = np.abs(decode_baseline_jpeg(a).astype(int) - orc.decode(a).astype(int))
    assert d.max() <= 4 and d.mean() < 1.0


def test_arith_jpeg_through_media_pipeline(spark):
    """decode_image dispatches SOF9 bytes by magic to the arithmetic
    decoder, and featurize_media(fake_decode=False) produces real features
    from them — the Spark-side plumbing, not just the codec."""
    from dedup.multimodal import FEATURE_DIM, MEDIA_SCHEMA, decode_image, featurize_media

    rng = np.random.default_rng(5)
    data = orc.encode(_src(rng, (24, 32), True), quality=90, arith=True)
    img = decode_image(data)
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8

    rows = [("a1", "image", data, "image/jpeg", None, None, None)]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = featurize_media(df, partitions=2, fake_decode=False).collect()
    assert len(out) == 1 and len(out[0]["feature"]) == FEATURE_DIM
