"""VP8L (lossless WebP) codec tests.

Round-trips prove encoder↔decoder agreement; the hand-built bitstreams
below exercise decoder paths the literal-only encoder never emits (color
cache, 2D LZ77, predictor/color/palette transforms, meta-Huffman groups),
each checked against an expected image computed by independent math in the
test — spec conformance, not self-consistency."""

from __future__ import annotations

import numpy as np
import pytest

import dedup.webp as W
from dedup.webp import BitWriter, decode_vp8l, decode_webp, encode_vp8l, encode_webp


# ---------------------------------------------------------- stream builder


def _emit(bw: BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, ln = codes[sym]
    for b in range(ln - 1, -1, -1):
        bw.write((code >> b) & 1, 1)


def _write_trees(bw: BitWriter, freq_list, alphabets):
    return [
        W._write_huffman_code(bw, W._huff_lengths(f), a)
        for f, a in zip(freq_list, alphabets)
    ]


def _write_token_body(bw: BitWriter, tokens, cache_bits=0):
    """tokens: ('lit', a, r, g, b) | ('ref', len_sym, len_extra,
    len_extra_bits, dist_sym, dist_extra, dist_extra_bits) |
    ('cache', idx). Emits trees + token stream (no cache/meta headers)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    gf, rf, bf, af, df = {}, {}, {}, {}, {}

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            bump(gf, g), bump(rf, r), bump(bf, b), bump(af, a)
        elif t[0] == "ref":
            bump(gf, 256 + t[1]), bump(df, t[4])
        else:
            bump(gf, 256 + 24 + t[1])
    alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
    cg, cr, cb, ca, cd = _write_trees(bw, [gf, rf, bf, af, df], alphabets)
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            _emit(bw, cg, g), _emit(bw, cr, r), _emit(bw, cb, b), _emit(bw, ca, a)
        elif t[0] == "ref":
            _, lsym, lex, lbits, dsym, dex, dbits = t
            _emit(bw, cg, 256 + lsym)
            if lbits:
                bw.write(lex, lbits)
            _emit(bw, cd, dsym)
            if dbits:
                bw.write(dex, dbits)
        else:
            _emit(bw, cg, 256 + 24 + t[1])


def _write_subimage(bw: BitWriter, argb: np.ndarray):
    """Literal-only sub-resolution image stream (no transforms, no meta)."""
    bw.write(0, 1)  # no color cache
    tokens = [
        ("lit", int(p[0]), int(p[1]), int(p[2]), int(p[3]))
        for p in argb.reshape(-1, 4)
    ]
    _write_token_body(bw, tokens)


def _header(bw: BitWriter, w: int, h: int):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


# -------------------------------------------------------------- roundtrip


@pytest.mark.parametrize("sg", [False, True])
@pytest.mark.parametrize("shape", [(1, 1, 3), (3, 5, 4), (31, 17, 4), (64, 48, 3)])
def test_roundtrip(shape, sg):
    rng = np.random.default_rng(hash((shape, sg)) & 0xFFFF)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_vp8l(encode_vp8l(img, subtract_green=sg))
    if shape[2] == 3:
        assert (out[:, :, 3] == 255).all()
        assert (out[:, :, :3] == img).all()
    else:
        assert (out == img).all()


def test_container_roundtrip_and_errors():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = encode_webp(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert (decode_webp(data)[:, :, :3] == img).all()
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    # a lossy VP8 chunk dispatches to the RFC 6386 decoder (vp8.py,
    # test_vp8.py); a truncated one is a clean error, not a misparse
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
    with pytest.raises(ValueError, match="truncated VP8"):
        decode_webp(lossy)


def test_subtract_green_helps_on_correlated_image():
    y, x = np.mgrid[0:64, 0:64]
    smooth = np.stack([((x + y) // 2).astype(np.uint8)] * 3, -1)
    assert len(encode_vp8l(smooth, subtract_green=True)) < 0.5 * len(
        encode_vp8l(smooth, subtract_green=False)
    )


# ------------------------------------------------- hand-built: lz77+cache


def test_lz77_backref_and_color_cache():
    # 1x9 image A B A B A B A B A:
    #   lit A, lit B, ref(len 6, dist 2 via the 2D map), cache-hit A
    A = (255, 10, 20, 30)  # a, r, g, b
    B = (255, 40, 50, 60)
    cache_bits = 4
    pxA = (A[0] << 24) | (A[1] << 16) | (A[2] << 8) | A[3]
    idxA = (0x1E35A7BD * pxA & 0xFFFFFFFF) >> (32 - cache_bits)
    # length 6 -> prefix sym 4 (offset 4) + 1 extra bit = 1
    # dist 2 with xsize 9: (2,0) is _DIST_MAP[5] -> dist_code 6 -> same
    # prefix sym 4, extra 1
    assert W._DIST_MAP[5] == (2, 0)
    assert W._plane_code_to_distance(9, 6) == 2
    tokens = [
        ("lit", *A),
        ("lit", *B),
        ("ref", 4, 1, 1, 4, 1, 1),
        ("cache", idxA),
    ]
    bw = BitWriter()
    _header(bw, 9, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    _write_token_body(bw, tokens, cache_bits=cache_bits)
    out = decode_vp8l(bw.getvalue())  # RGBA
    exp = np.array(
        [[A, B, A, B, A, B, A, B, A]], dtype=np.uint8
    )[:, :, [1, 2, 3, 0]]  # ARGB -> RGBA
    assert (out == exp).all()


def test_lz77_linear_distance_spans_rows():
    # 3x4: first row literals, then one ref copying 8 px at dist 4
    lits = [(255, i, 2 * i, 3 * i) for i in (1, 2, 3, 4)]
    # length 8 -> sym 5: offset (2+1)<<1=6, values 7..8 -> extra bit 1
    # dist 4 -> dist_code 124 (linear: 124-120) -> prefix value 124:
    #   sym 13: offset 96, value 97..128 -> extra = 124-96-1 = 27 (5 bits)
    tokens = [("lit", *p) for p in lits] + [("ref", 5, 1, 1, 13, 27, 5)]
    bw = BitWriter()
    _header(bw, 4, 3)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _write_token_body(bw, tokens)
    out = decode_vp8l(bw.getvalue())
    row = np.array([lits], dtype=np.uint8)[:, :, [1, 2, 3, 0]]
    assert (out == np.vstack([row, row, row])).all()


# ------------------------------------------------ hand-built: transforms


def test_predictor_transform_mode_top():
    # 4x2 image, one 4x4 block (bits=2), block mode 2 (= top pixel).
    orig = np.array(
        [
            [[255, 9, 8, 7], [255, 6, 5, 4], [255, 3, 2, 1], [255, 12, 13, 14]],
            [[255, 20, 30, 40], [255, 50, 60, 70], [255, 80, 90, 100], [255, 1, 2, 3]],
        ],
        dtype=np.uint8,
    )  # ARGB
    h, w = 2, 4
    res = np.zeros_like(orig)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(int(v) for v in orig[y, x - 1])  # left
            elif x == 0:
                pred = tuple(int(v) for v in orig[y - 1, x])  # top
            else:
                pred = tuple(int(v) for v in orig[y - 1, x])  # block mode 2
            for c in range(4):
                res[y, x, c] = (int(orig[y, x, c]) - pred[c]) & 0xFF
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # a transform
    bw.write(W._T_PREDICTOR, 2)
    bw.write(0, 3)  # bits = 2
    mode_img = np.array([[[255, 0, 2, 0]]], dtype=np.uint8)  # green = mode 2
    _write_subimage(bw, mode_img)
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    tokens = [
        ("lit", int(p[0]), int(p[1]), int(p[2]), int(p[3]))
        for p in res.reshape(-1, 4)
    ]
    _write_token_body(bw, tokens)
    out = decode_vp8l(bw.getvalue())
    assert (out == orig[:, :, [1, 2, 3, 0]]).all()


def test_color_transform_inverse():
    # one block, green_to_red=16 (i.e. +g/2), others 0
    g2r, g2b, r2b = 16, 0, 0
    orig = np.array(
        [[[255, 100, 64, 9], [255, 7, 32, 250]]], dtype=np.uint8
    )  # ARGB
    res = orig.copy()
    for y in range(1):
        for x in range(2):
            g = int(orig[y, x, 2])
            r = (int(orig[y, x, 1]) - W._ctd(g2r, g)) & 0xFF
            res[y, x, 1] = r
            b = (int(orig[y, x, 3]) - W._ctd(g2b, g) - W._ctd(r2b, r)) & 0xFF
            res[y, x, 3] = b
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(W._T_COLOR, 2)
    bw.write(1, 3)  # bits = 3 -> one block
    # cte pixel: ARGB with red=r2b, green=g2b, blue=g2r
    cte = np.array([[[255, r2b, g2b, g2r]]], dtype=np.uint8)
    _write_subimage(bw, cte)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    tokens = [
        ("lit", int(p[0]), int(p[1]), int(p[2]), int(p[3]))
        for p in res.reshape(-1, 4)
    ]
    _write_token_body(bw, tokens)
    out = decode_vp8l(bw.getvalue())
    assert (out == orig[:, :, [1, 2, 3, 0]]).all()


def test_palette_transform_with_pixel_bundling():
    # 10 pixels, 3 colors -> 2-bit indices packed 4-per-byte (width 3)
    palette = np.array(
        [[255, 200, 10, 30], [255, 0, 255, 0], [255, 5, 6, 7]], dtype=np.uint8
    )  # ARGB entries
    idx = [0, 1, 2, 1, 0, 0, 2, 2, 1, 0]
    bw = BitWriter()
    _header(bw, 10, 1)
    bw.write(1, 1)
    bw.write(W._T_COLOR_INDEX, 2)
    bw.write(len(palette) - 1, 8)
    # palette image stores entries delta-coded left to right
    deltas = palette.astype(np.int32).copy()
    deltas[1:] = (deltas[1:] - deltas[:-1]) & 0xFF
    _write_subimage(bw, deltas.astype(np.uint8).reshape(1, 3, 4))
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    packed = []
    for base in range(0, 12, 4):
        v = 0
        for k in range(4):
            if base + k < 10:
                v |= idx[base + k] << (2 * k)
        packed.append(v)
    tokens = [("lit", 0, 0, v, 0) for v in packed]
    _write_token_body(bw, tokens)
    out = decode_vp8l(bw.getvalue())
    exp = palette[np.array(idx)][:, [1, 2, 3, 0]].reshape(1, 10, 4)
    assert (out == exp).all()


def test_meta_huffman_two_groups():
    # 8x1 image, mbits=2 -> two 4-px blocks, each with its own literal
    # trees; group 0 emits only pixel P, group 1 only pixel Q
    P = (255, 1, 2, 3)
    Q = (255, 200, 201, 202)
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta huffman!
    bw.write(0, 3)  # mbits = 2
    # entropy image 2x1: (r<<8)|g = group index -> groups 0 and 1
    ent = np.array([[[255, 0, 0, 0], [255, 0, 1, 0]]], dtype=np.uint8)
    _write_subimage(bw, ent)
    alphabets = [256 + 24, 256, 256, 256, 40]
    codes = []
    for pix in (P, Q):
        a, r, g, b = pix
        freqs = [{g: 4}, {r: 4}, {b: 4}, {a: 4}, {}]
        codes.append(_write_trees(bw, freqs, alphabets))
    for i, pix in enumerate((P, Q)):
        cg, cr, cb, ca, _ = codes[i]
        a, r, g, b = pix
        for _ in range(4):
            _emit(bw, cg, g), _emit(bw, cr, r), _emit(bw, cb, b), _emit(bw, ca, a)
    out = decode_vp8l(bw.getvalue())
    exp = np.array([[P] * 4 + [Q] * 4], dtype=np.uint8)[:, :, [1, 2, 3, 0]]
    assert (out == exp).all()


# ------------------------------------------------------------ integration


def test_decode_image_dispatch_and_exact_dedup():
    from dedup.multimodal import decode_image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    out = decode_image(encode_webp(img))
    assert out.shape == (12, 9, 3) and (out == img).all()


def test_featurize_media_webp_payloads(spark):
    from dedup.multimodal import featurize_media

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (10, 10, 3), dtype=np.uint8) for _ in range(3)]
    imgs.append(imgs[0].copy())  # exact dup of the first
    rows = [
        (f"m{i}", "image", bytearray(encode_webp(im)), "image/webp", 10, 10, None)
        for i, im in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    feats = featurize_media(df, partitions=2, fake_decode=False).collect()
    assert len(feats) == 4
    by_id = {r["media_id"]: r for r in feats}
    assert by_id["m0"]["sha256"] == by_id["m3"]["sha256"]
    assert by_id["m0"]["sha256"] != by_id["m1"]["sha256"]
    # feature of the dup is identical, others differ
    assert by_id["m0"]["feature"] == by_id["m3"]["feature"]
    assert by_id["m0"]["feature"] != by_id["m1"]["feature"]
