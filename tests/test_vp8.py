"""Lossy-WebP / VP8 keyframe decoder (dedup/vp8.py, RFC 6386) — verified
bit-exact at the spec-determined YUV surface against the system libwebp,
the same decode-against-reference-binary gate the JPEG decoder passes
against JVM ImageIO (tests/test_multimodal.py).

Three layers:
  1. golden vectors: two committed encoder outputs with sha256'd expected
     planes — runs even without libwebp on the box;
  2. simple-API corpus: libwebp-encoded images spanning content classes,
     sizes (incl. non-MB-multiples), and qualities — every Y/U/V byte
     must match libwebp's own decode;
  3. advanced-API corpus: streams forcing the features the simple API
     never emits — the SIMPLE loop filter, sharpness 1..7, and multiple
     token partitions (method=0).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from dedup.vp8 import _parse_header, decode_vp8, yuv_to_rgb
from dedup.webp import decode_webp

from tests import libwebp_oracle as O

LIB = O.load()
needs_libwebp = pytest.mark.skipif(LIB is None, reason="no system libwebp")


# --------------------------------------------------------------- goldens

# (hex-encoded file, [sha256(Y), sha256(U), sha256(V)], Y shape, UV shape)
GOLDENS = {
    "grad_33x17_q70": (
        "52494646d80000005745425056503820cc0000001006009d012a210011003e9d3e9b48a5"
        "a322a12ab80df8b0138968009d32c23908600055a599f2628a80e7018d185bde2f63a784"
        "059e59068000fefc6a6e698d2c31d2a3b4bccf61c73fea2751b6eae18e6f2a6b6539b4ae"
        "04a8b875fa0114dfb6eaec2dd9f6b2861d850ae7a3ed2a55b49efbae6a87f6bebff398f2"
        "dfaadff28c4b00fa33d587f8ff8fbf5688af718f366427af45fbbcab089f687a6e4bfa1c"
        "6e00b19fd0e372da60880984afaf13926ecca601d07609143f9c8325dfb8f11dc3af7ee1"
        "fd7b449fd71c0000",
        [
            "5ba6e3ab4751e87f40447fed8ecf0c348c4d5c92a339595c1e2804942253212f",
            "6d711cfce493ec2de7691bb8c9d01d5b78daa180cee10747056e3603fd04930c",
            "444e010f8c201f0d9a51e3251814768dd849f66ace1b12cfb9bf00f998b3c1ce",
        ],
        (17, 33),
        (9, 17),
    ),
    "blocks_32x24_q45": (
        "524946466a00000057454250565038205e0000001003009d012a2000180003005225a002"
        "c47b8dc0ded7c3b9b37dd5ccfc0d49ede000feb4fffee827fdcbfff0de77f3f7cb1509bf"
        "e44bc2ff0b7fc4e78fffdbe7149647be0e1967d7ebb5fea33ccc709b6fef2bfc8772aaa1"
        "3d3659280000",
        [
            "ae85e6aed86432c7108cb104cab2c66b77ad3064e0d65abfa08486e5290b5992",
            "7f2593d0168f0ee9aa5efa883202c9088bbef7e7ec8d1dc53f2e3920fc55a514",
            "8e9dea616861a49b8aedad7590a7c7aaffbc1b6c4e31862445eb51077478544b",
        ],
        (24, 32),
        (12, 16),
    ),
}


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden_vectors(name):
    hx, hashes, y_shape, uv_shape = GOLDENS[name]
    data = bytes.fromhex(hx)
    y, u, v = decode_vp8(O.vp8_payload(data))
    assert y.shape == y_shape and u.shape == uv_shape and v.shape == uv_shape
    for plane, expect in zip((y, u, v), hashes):
        assert hashlib.sha256(plane.tobytes()).hexdigest() == expect


# ------------------------------------------------------------- image zoo


def _images():
    rng = np.random.default_rng(7)
    imgs = {}
    for (w, h) in [(32, 24), (48, 48), (33, 17), (16, 16), (80, 56)]:
        x = np.linspace(0, 255, w)[None, :] + np.linspace(0, 90, h)[:, None]
        imgs[f"grad_{w}x{h}"] = np.stack(
            [x % 256, (x * 0.7) % 256, np.full((h, w), 60.0)], -1
        ).astype(np.uint8)
    base = rng.integers(0, 256, (8, 6, 3), np.uint8)
    imgs["blocky_48x64"] = np.repeat(np.repeat(base, 8, 0), 8, 1)
    imgs["noise_40x40"] = rng.integers(0, 256, (40, 40, 3), np.uint8)
    imgs["flat_32x32"] = np.full((32, 32, 3), 130, np.uint8)
    e = np.zeros((40, 56, 3), np.uint8)
    e[::4, :, :] = 255
    e[:, ::6, 1] = 200
    imgs["edges_56x40"] = e
    return imgs


def _assert_bit_exact(data: bytes):
    ref = O.decode_yuv(LIB, data)
    got = decode_vp8(O.vp8_payload(data))
    for pn, a, b in zip("YUV", got, ref):
        assert a.shape == b.shape, (pn, a.shape, b.shape)
        assert np.array_equal(a, b), (
            f"{pn} differs: "
            f"{int(np.abs(a.astype(int) - b.astype(int)).max())} maxdiff, "
            f"{int((a != b).sum())} px"
        )


@needs_libwebp
@pytest.mark.parametrize("quality", [95.0, 50.0, 12.0])
def test_bit_exact_vs_libwebp_simple_api(quality):
    for name, rgb in _images().items():
        _assert_bit_exact(O.encode_rgb(LIB, rgb, quality))


@needs_libwebp
def test_bit_exact_extreme_qualities():
    rgb = _images()["grad_48x48"]
    for q in (0.0, 100.0):
        _assert_bit_exact(O.encode_rgb(LIB, rgb, q))


@needs_libwebp
@pytest.mark.parametrize(
    "kw",
    [
        # SIMPLE loop filter (config filter_type=0 means simple on-stream)
        dict(filter_type=0, filter_strength=60),
        dict(filter_type=0, filter_strength=25),
        # sharpness levels (normal filter)
        dict(filter_type=1, filter_sharpness=3),
        dict(filter_type=1, filter_sharpness=7),
        # multiple token partitions (honored by the method=0 encoder path)
        dict(partitions=3, method=0),
        dict(partitions=2, method=0, filter_type=0),
    ],
)
def test_bit_exact_vs_libwebp_forced_features(kw):
    if not O.advanced_available(LIB):
        pytest.skip("libwebp advanced ABI not recognized")
    rng = np.random.default_rng(13)
    imgs = [
        _images()["edges_56x40"],
        rng.integers(0, 256, (96, 112, 3), np.uint8),
    ]
    for rgb in imgs:
        data = O.encode_advanced(LIB, rgb, 55.0, **kw)
        f, _ = _parse_header(O.vp8_payload(data))
        if "filter_type" in kw and kw["filter_type"] == 0:
            assert f.filter_type == 1, "expected simple filter on-stream"
        if kw.get("partitions"):
            assert len(f.partitions) == 1 << kw["partitions"]
        _assert_bit_exact(data)


@needs_libwebp
def test_decode_webp_rgba_and_multimodal_dispatch():
    """decode_webp dispatches VP8 chunks; featurize consumes the RGBA."""
    rgb = _images()["grad_32x24"]
    data = O.encode_rgb(LIB, rgb, 80.0)
    rgba = decode_webp(data)
    assert rgba.shape == (24, 32, 4)
    assert (rgba[:, :, 3] == 255).all()
    # lossy roundtrip stays near the source
    err = np.abs(rgba[:, :, :3].astype(int) - rgb.astype(int)).mean()
    assert err < 12.0, err

    from dedup.multimodal import decode_image

    assert np.array_equal(decode_image(data), rgba[:, :, :3])


def test_yuv_to_rgb_shapes_and_range():
    y = np.full((5, 7), 128, np.uint8)
    u = np.full((3, 4), 128, np.uint8)
    v = np.full((3, 4), 128, np.uint8)
    rgb = yuv_to_rgb(y, u, v)
    assert rgb.shape == (5, 7, 3)
    assert np.abs(rgb.astype(int) - 130).max() <= 2  # mid-gray


def test_reject_malformed():
    with pytest.raises(ValueError):
        decode_vp8(b"\x00" * 4)  # too short
    # non-keyframe bit set
    good = bytes.fromhex(GOLDENS["blocks_32x24_q45"][0])
    payload = bytearray(O.vp8_payload(good))
    payload[0] |= 1
    with pytest.raises(ValueError, match="keyframe"):
        decode_vp8(bytes(payload))
    # bad start code
    payload = bytearray(O.vp8_payload(good))
    payload[3] = 0
    with pytest.raises(ValueError, match="start code"):
        decode_vp8(bytes(payload))
