"""Baseline-TIFF codec tests (dedup/tiff.py): independent-implementation
round-trips, hand-crafted variant bitstreams (byte order, planar layout,
photometrics, sub-byte depths), cross-decoder conformance against the JVM
ImageIO TIFF plugin in both directions, and the media-pipeline dispatch."""

from __future__ import annotations

import struct

import numpy as np

from dedup.tiff import decode_tiff, encode_tiff


def _gradient(h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.dstack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (h + w))]
    ).astype(np.uint8)
    return np.clip(
        img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
    ).astype(np.uint8)


def _craft(endian: str, tags: list[tuple[int, int, list[int]]], payload: bytes) -> bytes:
    """Hand-assemble a single-IFD TIFF so the decoder is tested on streams
    the encoder cannot produce (MM order, planar, palette, 4/16-bit, ...).

    `tags` entries are (tag, field_type, values). Values that don't fit the
    4-byte inline slot are placed in an out-of-line block between the IFD
    and the payload automatically. Strip offsets (273) and anything whose
    value is a byte position into `payload` must be given RELATIVE to the
    payload start as ("rel", [positions...])-style negative markers — here
    encoded simply as values >= 1 << 30 minus that flag: to keep the helper
    obvious we instead treat tag 273's values as payload-relative always.
    """
    e = "<" if endian == "II" else ">"
    sizes = {1: 1, 3: 2, 4: 4}
    codes = {1: "B", 3: "H", 4: "I"}
    n = len(tags)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    # first pass: sizes of out-of-line blocks
    extra_len = sum(
        sizes[ft] * len(vals)
        for _, ft, vals in tags
        if sizes[ft] * len(vals) > 4
    )
    data_off = extra_off + extra_len
    out = bytearray(struct.pack(e + "2sHI", endian.encode(), 42, ifd_off))
    out += struct.pack(e + "H", n)
    extra = bytearray()
    for tag, ftype, vals in sorted(tags):
        if tag == 273:
            vals = [data_off + v for v in vals]
        packed = struct.pack(e + codes[ftype] * len(vals), *vals)
        out += struct.pack(e + "HHI", tag, ftype, len(vals))
        if len(packed) <= 4:
            out += packed.ljust(4, b"\x00")
        else:
            out += struct.pack(e + "I", extra_off + len(extra))
            extra += packed
    out += struct.pack(e + "I", 0)
    out += extra
    out += payload
    return bytes(out)


def test_tiff_roundtrip_all_compressions():
    """Encoder and decoder are independent implementations (separate LZW
    string tables, separate PackBits run construction), so an exact
    round-trip across every compression x predictor x strip split is a
    two-implementation conformance check, not a tautology."""
    img = _gradient(37, 53, 3)
    for comp in ("none", "packbits", "lzw", "deflate"):
        preds = [False, True] if comp in ("lzw", "deflate") else [False]
        for pred in preds:
            for rps in (None, 7):
                enc = encode_tiff(img, comp, predictor=pred, rows_per_strip=rps)
                assert np.array_equal(decode_tiff(enc), img), (comp, pred, rps)
    # predictor+deflate compresses this smooth gradient better than raw
    assert len(encode_tiff(img, "deflate", predictor=True)) < len(
        encode_tiff(img, "none")
    )


def test_tiff_lzw_early_change_boundary():
    """A raster long enough to push the LZW table through the 511/1023/2047
    width bumps and a 4094-entry Clear exercises the 'early change' rule on
    both sides; random bytes maximize table growth rate."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    enc = encode_tiff(img, "lzw")
    assert np.array_equal(decode_tiff(enc), img)


def test_tiff_big_endian_and_white_is_zero():
    """MM byte order with photometric 0 (WhiteIsZero) grayscale: sample
    values invert, and all multi-byte IFD fields parse big-endian."""
    g = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
    b = _craft(
        "MM",
        [
            (256, 4, [6]), (257, 4, [4]), (258, 3, [8]), (259, 3, [1]),
            (262, 3, [0]), (273, 4, [0]), (277, 3, [1]), (278, 4, [4]),
            (279, 4, [24]),
        ],
        g.tobytes(),
    )
    assert np.array_equal(decode_tiff(b), np.dstack([255 - g] * 3))


def test_tiff_planar_rgb():
    """Planar configuration 2: one strip per color plane, reassembled into
    chunky RGB."""
    img = _gradient(5, 7, 21)
    planes = img.transpose(2, 0, 1).tobytes()  # R plane, G plane, B plane
    b = _craft(
        "II",
        [
            (256, 4, [7]), (257, 4, [5]), (258, 3, [8, 8, 8]), (259, 3, [1]),
            (262, 3, [2]), (273, 4, [0, 35, 70]), (277, 3, [3]),
            (278, 4, [5]), (279, 4, [35, 35, 35]), (284, 3, [2]),
        ],
        planes,
    )
    assert np.array_equal(decode_tiff(b), img)


def test_tiff_palette_and_4bit_gray():
    """8-bit palette via ColorMap's 16-bit entries, then 4-bit grayscale
    bit unpacking with odd-width row padding."""
    rng = np.random.default_rng(4)
    lut8 = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (6, 9), dtype=np.uint8)
    cmap_vals = (lut8.T.astype(int) << 8).flatten().tolist()  # 3*256 SHORTs
    b = _craft(
        "II",
        [
            (256, 4, [9]), (257, 4, [6]), (258, 3, [8]), (259, 3, [1]),
            (262, 3, [3]), (273, 4, [0]), (277, 3, [1]), (278, 4, [6]),
            (279, 4, [54]), (320, 3, cmap_vals),
        ],
        idx.tobytes(),
    )
    assert np.array_equal(decode_tiff(b), lut8[idx])

    g4 = np.array([[0, 5, 10, 15, 7], [1, 2, 3, 4, 8]], dtype=np.uint8)
    packed_rows = []
    for row in g4:
        bits = np.zeros(((len(row) + 1) // 2) * 2, dtype=np.uint8)
        bits[: len(row)] = row
        packed_rows.append(((bits[0::2] << 4) | bits[1::2]).tobytes())
    payload = b"".join(packed_rows)
    b4 = _craft(
        "II",
        [
            (256, 4, [5]), (257, 4, [2]), (258, 3, [4]), (259, 3, [1]),
            (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [2]),
            (279, 4, [len(payload)]),
        ],
        payload,
    )
    expect = np.dstack([(g4.astype(np.uint32) * 255 // 15).astype(np.uint8)] * 3)
    assert np.array_equal(decode_tiff(b4), expect)


def test_tiff_16bit_rescales_and_alpha_dropped():
    """16-bit samples rescale to 8-bit (high byte) in both byte orders;
    RGBA extra samples are dropped like every other decode_image branch."""
    img = _gradient(3, 4, 8)
    hi16 = (img.astype(np.uint16) << 8) | 0x7F
    for endian, dt in (("II", "<u2"), ("MM", ">u2")):
        b = _craft(
            endian,
            [
                (256, 4, [4]), (257, 4, [3]), (258, 3, [16, 16, 16]),
                (259, 3, [1]), (262, 3, [2]), (273, 4, [0]), (277, 3, [3]),
                (278, 4, [3]), (279, 4, [72]),
            ],
            hi16.astype(dt).tobytes(),
        )
        assert np.array_equal(decode_tiff(b), img), endian

    rgba = np.dstack([img, np.full(img.shape[:2], 9, np.uint8)])
    b = _craft(
        "II",
        [
            (256, 4, [4]), (257, 4, [3]), (258, 3, [8, 8, 8, 8]),
            (259, 3, [1]), (262, 3, [2]), (273, 4, [0]), (277, 3, [4]),
            (278, 4, [3]), (279, 4, [48]), (338, 3, [2]),
        ],
        rgba.tobytes(),
    )
    assert np.array_equal(decode_tiff(b), img)


def test_tiff_encoder_accepted_by_jvm_imageio(spark, tmp_path):
    """Cross-decoder conformance, direction 1: our encoder's bitstream for
    every compression mode must decode EXACTLY in the independent JVM
    ImageIO TIFF plugin (Spark's image source) — TIFF is lossless, so the
    comparison is bit-for-bit."""
    img = _gradient(32, 41, 7)
    for comp in ("none", "packbits", "lzw", "deflate"):
        preds = [False, True] if comp in ("lzw", "deflate") else [False]
        for pred in preds:
            p = tmp_path / f"enc_{comp}_{pred}.tif"
            p.write_bytes(encode_tiff(img, comp, predictor=pred, rows_per_strip=11))
            row = spark.read.format("image").load(str(p)).select("image.*").head()
            assert (row.height, row.width) == (32, 41), (comp, pred)
            ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
                32, 41, row.nChannels
            )[..., :3][..., ::-1]
            assert np.array_equal(ref, img), (comp, pred)


def test_tiff_decoder_reads_jvm_imageio_bitstreams(spark, tmp_path):
    """Cross-decoder conformance, direction 2: TIFF bitstreams PRODUCED by
    the JVM ImageIO writer — its own LZW/Deflate/PackBits encoders, with
    and without tiling — must decode exactly in our decoder, proving it
    handles streams we did not author (including the writer's choice of
    predictor and tile geometry)."""
    img = _gradient(40, 57, 9)
    src = tmp_path / "src.tif"
    src.write_bytes(encode_tiff(img))
    jvm = spark._jvm
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(str(src)))
    assert bi is not None

    def jvm_write(path: str, ctype: str | None, tile: int | None) -> None:
        wr = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
        param = wr.getDefaultWriteParam()
        if ctype:
            param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            param.setCompressionType(ctype)
        if tile:
            param.setTilingMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            param.setTiling(tile, tile, 0, 0)
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(
            jvm.java.io.File(path)
        )
        wr.setOutput(ios)
        wr.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
        ios.close()

    for ctype in (None, "LZW", "PackBits", "Deflate", "ZLib"):
        for tile in (None, 16):
            p = tmp_path / f"jvm_{ctype}_{tile}.tif"
            jvm_write(str(p), ctype, tile)
            assert np.array_equal(decode_tiff(p.read_bytes()), img), (ctype, tile)


def test_tiff_through_media_pipeline(spark):
    """TIFF payloads dispatch by magic bytes through
    featurize_media(fake_decode=False): identical pixels under different
    compressions -> identical sha256; distinct pixels -> distinct."""
    from dedup.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        exact_media_dedup,
        featurize_media,
    )

    img_a, img_b = _gradient(12, 12, 31), _gradient(12, 12, 32)
    rows = [
        ("t0", "image", encode_tiff(img_a, "lzw"), "image/tiff", None, None, None),
        ("t1", "image", encode_tiff(img_b, "deflate", predictor=True),
         "image/tiff", None, None, None),
        ("t0dup", "image", encode_tiff(img_a, "lzw"), "image/tiff",
         None, None, None),
        ("t0pb", "image", encode_tiff(img_a, "packbits"), "image/tiff",
         None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = featurize_media(media, partitions=2, fake_decode=False)
    got = {r["media_id"]: r for r in feats.collect()}
    assert len(got) == 4
    # byte-identical payloads hash equal; a recompression of the SAME
    # pixels hashes differently but featurizes identically
    assert got["t0"]["sha256"] == got["t0dup"]["sha256"]
    assert got["t0"]["sha256"] != got["t0pb"]["sha256"]
    assert np.allclose(got["t0"]["feature"], got["t0pb"]["feature"])
    assert got["t0"]["sha256"] != got["t1"]["sha256"]
    dups = {r["media_id"]: r["media_rep"] for r in exact_media_dedup(feats).collect()}
    assert dups["t0dup"] == dups["t0"]
    assert np.array_equal(decode_image(encode_tiff(img_a, "lzw")), img_a)
