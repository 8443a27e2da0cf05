"""Lossless JPEG (SOF3, ITU-T.81 Annex H) — hand-computed golden
bitstreams plus encoder/decoder round-trips.

The system libjpeg.so.62 predates lossless support, so (as for VP8L)
conformance evidence is an independent hand-derivation: the golden tests
below code a tiny image on paper — predictor defaults, category/EXTEND
bits, canonical Huffman codes — and pin BOTH directions to those exact
bytes, so the decoder is never graded by its own inverse alone.
"""

import numpy as np
import pytest

from dedup.jpeg_lossless import (
    _ENC_COUNTS,
    _ENC_SYMBOLS,
    decode_lossless_jpeg,
    encode_lossless_jpeg,
)


def _entropy_bytes(jpg: bytes) -> bytes:
    """The scan's entropy bytes (between SOS payload and EOI)."""
    i = jpg.find(b"\xff\xda")
    seglen = int.from_bytes(jpg[i + 2 : i + 4], "big")
    return jpg[i + 2 + seglen : -2]


def test_golden_2x2_gray_predictor1():
    """Hand-coded reference for [[100,101],[50,200]] at precision 8.

    Huffman: 17 symbols, all length 5, canonical -> code(S) == S.
    (0,0): pred=default 128, d=-28  -> S=5, extend bits 00011
    (0,1): opening line uses Ra=100, d=+1 -> S=1, bit 1
    (1,0): line start uses Rb=100, d=-50 -> S=6, bits 001101
    (1,1): predictor 1, Ra=50, d=+150 -> S=8, bits 10010110
    Concatenated (40 bits, no padding): 28 C3 31 A8 96.
    """
    img = np.array([[100, 101], [50, 200]], dtype=np.uint16)
    jpg = encode_lossless_jpeg(img, precision=8, predictor=1)
    assert _entropy_bytes(jpg) == bytes.fromhex("28c331a896")
    out, prec = decode_lossless_jpeg(jpg)
    assert prec == 8
    assert out[:, :, 0].tolist() == img.tolist()


def test_golden_ssss16_wraparound():
    """precision 16: first sample 0 predicts from default 32768, so the
    difference is -32768 == SSSS category 16, which carries NO extra bits
    (H.2) and must reconstruct via the mod-2^16 wraparound."""
    img = np.array([[0]], dtype=np.uint16)
    jpg = encode_lossless_jpeg(img, precision=16, predictor=1)
    # one code: S=16 -> code 16 at length 5 = 10000, padded with 1s
    assert _entropy_bytes(jpg) == bytes([0b10000111])
    out, prec = decode_lossless_jpeg(jpg)
    assert prec == 16
    assert out[0, 0, 0] == 0


def test_golden_decode_handassembled_stream():
    """Decode a fully hand-assembled SOF3 file (not produced by our
    encoder): 1x3 gray, precision 8, predictor 1, samples 200 10 10.

    (0,0): pred=128, d=+72 -> S=7, bits 1001000
    (0,1): Ra=200, d=-190 -> S=8, bits 01000001   (-190 + 255)
    (0,2): Ra=10,  d=0    -> S=0, no bits
    codes: 00111|1001000|01000|01000001|00000 -> 30 bits + 2 pad 1s
    = 00111100 10000100 00100000 10000011 -> 3C 84 20 83
    """
    bits = "00111" + "1001000" + "01000" + "01000001" + "00000" + "11"
    scan = int(bits, 2).to_bytes(4, "big")
    assert scan == bytes.fromhex("3c842083")
    dht = bytes([0x00]) + bytes(_ENC_COUNTS) + _ENC_SYMBOLS
    jpg = (
        b"\xff\xd8"
        + b"\xff\xc3" + (2 + 9).to_bytes(2, "big")
        + bytes([8]) + (1).to_bytes(2, "big") + (3).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
        + b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
        + b"\xff\xda" + (2 + 6).to_bytes(2, "big")
        + bytes([1, 1, 0x00, 1, 0, 0])
        + scan
        + b"\xff\xd9"
    )
    out, prec = decode_lossless_jpeg(jpg)
    assert out[:, :, 0].tolist() == [[200, 10, 10]]


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_all_predictors(predictor):
    rng = np.random.default_rng(predictor)
    img = rng.integers(0, 256, size=(9, 7), dtype=np.uint16)
    out, prec = decode_lossless_jpeg(
        encode_lossless_jpeg(img, precision=8, predictor=predictor)
    )
    assert np.array_equal(out[:, :, 0], img)


@pytest.mark.parametrize("precision", [2, 4, 12, 16])
def test_roundtrip_precisions(precision):
    rng = np.random.default_rng(precision)
    img = rng.integers(0, 1 << precision, size=(6, 5), dtype=np.uint16)
    out, prec = decode_lossless_jpeg(
        encode_lossless_jpeg(img, precision=precision, predictor=4)
    )
    assert prec == precision
    assert np.array_equal(out[:, :, 0], img)


def test_roundtrip_three_components_interleaved():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint16)
    out, _ = decode_lossless_jpeg(encode_lossless_jpeg(img, predictor=7))
    assert np.array_equal(out, img)


def test_roundtrip_restart_intervals():
    """Restart markers reset the predictor to scan-start state (default
    prediction, then Ra for the rest of that interval's opening line)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 4096, size=(5, 7), dtype=np.uint16)
    jpg = encode_lossless_jpeg(img, precision=12, predictor=6, restart_interval=4)
    assert b"\xff\xd0" in jpg  # at least one RST0 emitted
    out, _ = decode_lossless_jpeg(jpg)
    assert np.array_equal(out[:, :, 0], img)


def test_roundtrip_point_transform():
    """Pt divides samples before coding; the decoder shifts back, so the
    round trip preserves x >> Pt << Pt (lossy only in the dropped bits)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(4, 4), dtype=np.uint16)
    out, _ = decode_lossless_jpeg(
        encode_lossless_jpeg(img, precision=8, predictor=1, point_transform=2)
    )
    assert np.array_equal(out[:, :, 0], (img >> 2) << 2)


def test_decode_image_dispatch():
    """multimodal.decode_image routes SOF3 through the lossless path and
    returns (H, W, 3) uint8; 12-bit samples rescale to 0..255."""
    from dedup.multimodal import decode_image

    gray = np.array([[0, 2048], [4095, 1024]], dtype=np.uint16)
    rgb = decode_image(encode_lossless_jpeg(gray, precision=12))
    assert rgb.shape == (2, 2, 3)
    assert rgb[0, 0].tolist() == [0, 0, 0]
    assert rgb[1, 0].tolist() == [255, 255, 255]
    assert abs(int(rgb[0, 1, 0]) - 128) <= 1

    color = np.array([[[10, 250, 77]]], dtype=np.uint16)
    assert decode_image(encode_lossless_jpeg(color)).tolist() == [[[10, 250, 77]]]
