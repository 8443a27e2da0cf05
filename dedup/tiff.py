"""Pure-stdlib/numpy baseline-TIFF codec for the multimodal decode path.

TIFF is the remaining still-image container common in scanned / archival
web corpora that the engine's decode matrix did not cover. Like the PNG,
GIF, JPEG, and WebP decoders here, nothing below needs an external codec
library: TIFF 6.0 baseline compression is uncompressed, PackBits (a
byte-level RLE), LZW (MSB-first with the "early change" quirk, distinct
from GIF's LSB-first variant in ``dedup.gif``), and Deflate (zlib, tag 8
or the legacy 32946) — all expressible with ``zlib`` + dict-table loops.

Decoder coverage (``decode_tiff``): both byte orders (II/MM), strip and
tile organization, chunky and planar sample layout, photometric
WhiteIsZero / BlackIsZero / RGB / palette, bit depths 1/4/8/16 (16-bit
rescaled to 8 like the PPM path), horizontal-differencing predictor
(tag 317 = 2), and extra samples (alpha dropped, matching every other
``decode_image`` branch). Output is always HxWx3 uint8.

The encoder (``encode_tiff``) is NOT the decoder inverted: it builds its
own LZW string table and PackBits runs, so round-trip tests exercise two
independent implementations — and the JVM ImageIO TIFF plugin (Java 9+)
serves as the spec oracle in both directions (tests/test_multimodal.py).

Scale shape: decoding runs batch-at-a-time inside ``featurize_media``'s
``mapInPandas`` (dedup/multimodal.py), one Arrow batch of binary payloads
per task — per-payload Python is the per-item decode a codec library
would also spend; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF 6.0 field types -> (struct code, byte size)
_TYPES = {1: ("B", 1), 2: ("B", 1), 3: ("H", 2), 4: ("I", 4), 6: ("b", 1),
          8: ("h", 2), 9: ("i", 4), 11: ("f", 4)}


def _read_ifd(b: bytes, endian: str) -> dict[int, list[int]]:
    """Parse IFD0 into {tag: [values...]}; offsets resolved, RATIONALs and
    unknown types skipped (none are needed for baseline decode)."""
    (ifd_off,) = struct.unpack_from(endian + "I", b, 4)
    (n,) = struct.unpack_from(endian + "H", b, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(endian + "HHI", b, off)
        if ftype not in _TYPES:
            continue
        code, size = _TYPES[ftype]
        total = size * count
        if total <= 4:
            val_off = off + 8
        else:
            (val_off,) = struct.unpack_from(endian + "I", b, off + 8)
        tags[tag] = list(struct.unpack_from(endian + code * count, b, val_off))
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits RLE (TIFF 6.0 section 9)."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[pos : pos + 1] * (257 - h)
            pos += 1
        # h == 128: no-op
    return bytes(out[:expected])


def _packbits(data: bytes) -> bytes:
    """Independent PackBits compressor (repeat runs >= 3, literals else)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j - i >= 2:  # repeat run of length j-i+1
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        # literal run up to the next >=3 repeat (or 128 bytes)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first variable-width codes starting at 9 bits,
    dictionary grows to 4094 then requires a ClearCode, and the width
    bumps one code EARLY (at table size 511/1023/2047 — TIFF 6.0's
    'early change', the wire-format difference vs GIF's LSB-first LZW)."""
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # 256 Clear, 257 EOI placeholders
        return 9

    width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _CLEAR:
                width = reset()
                prev = None
                continue
            if code == _EOI:
                return bytes(out[:expected])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"corrupt TIFF LZW stream (code {code})")
            out += entry
            prev = entry
            if len(table) + 1 >= (1 << width) and width < 12:  # early change
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF LZW compressor (own string table, early change)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(_CLEAR, width)
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # writer bumps width when the NEXT code to assign no longer fits,
        # one early vs the naive rule — mirrors the decoder's early change
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _decompress(data: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        return data[:expected]
    if comp == 5:
        return _lzw_decode(data, expected)
    if comp in (8, 32946):
        return zlib.decompress(data)[:expected]
    if comp == 32773:
        return _unpackbits(data, expected)
    raise NotImplementedError(
        f"TIFF compression {comp} not supported (baseline: none/LZW/"
        "Deflate/PackBits; CCITT fax and JPEG-in-TIFF need format-specific "
        "coders this path does not ship)"
    )


def _unpredict(rows: np.ndarray, spp: int) -> np.ndarray:
    """Undo horizontal differencing (predictor 2): cumsum per sample."""
    h, stride = rows.shape
    px = rows.reshape(h, stride // spp, spp)
    return np.cumsum(px, axis=1, dtype=np.uint32).astype(np.uint8).reshape(h, stride)


def _expand_bits(rows: np.ndarray, w: int, depth: int, spp: int) -> np.ndarray:
    """(h, row_bytes) packed rows -> (h, w, spp) samples at native depth."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * spp].reshape(h, w, spp)
    if depth == 16:
        # byte order already normalized to big-endian by the caller
        wide = rows[:, : w * spp * 2].reshape(h, w * spp, 2)
        v16 = (wide[..., 0].astype(np.uint16) << 8) | wide[..., 1]
        return v16.reshape(h, w, spp)
    if depth in (1, 4):
        bits = np.unpackbits(rows, axis=1)
        if depth == 1:
            vals = bits[:, : w * spp]
        else:
            nib = bits.reshape(h, -1, 4)
            vals = (
                nib[..., 0] * 8 + nib[..., 1] * 4 + nib[..., 2] * 2 + nib[..., 3]
            )[:, : w * spp]
        return vals.reshape(h, w, spp)
    raise NotImplementedError(f"TIFF bit depth {depth} not supported")


def decode_tiff(b: bytes) -> np.ndarray:
    """Decode a baseline TIFF payload to an HxWx3 uint8 array (IFD0 only —
    multi-page documents decode their first page, matching GIF stills)."""
    if b[:4] == b"II*\x00":
        endian = "<"
    elif b[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    t = _read_ifd(b, endian)
    w, h = t[256][0], t[257][0]
    spp = t.get(277, [1])[0]
    depths = t.get(258, [1] * spp)
    if len(set(depths)) != 1:
        raise NotImplementedError("heterogeneous TIFF BitsPerSample")
    depth = depths[0]
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    planar = t.get(284, [1])[0]
    predictor = t.get(317, [1])[0]
    tiled = 322 in t

    if tiled:
        tw, th = t[322][0], t[323][0]
        offsets, counts = t[324], t[325]
    else:
        tw, th = w, t.get(278, [h])[0]
        offsets, counts = t[273], t[279]

    chunk_spp = 1 if planar == 2 else spp
    row_bytes = (tw * chunk_spp * depth + 7) // 8
    planes = spp if planar == 2 else 1
    per_plane = len(offsets) // planes

    def read_chunk(idx: int, rows_here: int) -> np.ndarray:
        raw = _decompress(
            b[offsets[idx] : offsets[idx] + counts[idx]], comp, row_bytes * rows_here
        )
        rows = np.frombuffer(raw.ljust(row_bytes * rows_here, b"\x00"), np.uint8)
        rows = rows.reshape(rows_here, row_bytes)
        if depth == 16 and endian == "<":  # normalize to big-endian pairs
            rows = rows.reshape(rows_here, -1, 2)[:, :, ::-1].reshape(
                rows_here, row_bytes
            )
        if predictor == 2:
            if depth != 8:
                raise NotImplementedError("TIFF predictor on non-8-bit samples")
            rows = _unpredict(rows, chunk_spp)
        return _expand_bits(rows, tw, depth, chunk_spp)

    img = np.zeros((h, w, spp), dtype=np.uint16 if depth == 16 else np.uint8)
    for plane in range(planes):
        dest = img[:, :, plane : plane + 1] if planar == 2 else img
        if tiled:
            across = (w + tw - 1) // tw
            for k in range(per_plane):
                ty, tx = divmod(k, across)
                y0, x0 = ty * th, tx * tw
                px = read_chunk(plane * per_plane + k, th)
                dest[y0 : y0 + th, x0 : x0 + tw] = px[
                    : min(th, h - y0), : min(tw, w - x0)
                ]
        else:
            y0 = 0
            for k in range(per_plane):
                rows_here = min(th, h - y0)
                px = read_chunk(plane * per_plane + k, rows_here)
                dest[y0 : y0 + rows_here] = px[:rows_here, :w]
                y0 += rows_here

    if depth == 16:
        img = (img >> 8).astype(np.uint8)
    max_v = (1 << min(depth, 8)) - 1

    if photo == 3:  # palette: ColorMap is 3 planes of 2^depth 16-bit values
        cm = np.asarray(t[320], dtype=np.uint16).reshape(3, -1)
        lut = (cm >> 8).astype(np.uint8).T  # (2^depth, 3)
        return lut[img[:, :, 0]]
    if photo in (0, 1):  # bilevel/grayscale (0 = WhiteIsZero)
        g = img[:, :, 0].astype(np.uint32) * 255 // max_v
        if photo == 0:
            g = 255 - g
        return np.dstack([g.astype(np.uint8)] * 3)
    if photo == 2:  # RGB, extra samples (alpha) dropped
        if depth == 1 or depth == 4:
            img = (img.astype(np.uint32) * 255 // max_v).astype(np.uint8)
        return img[:, :, :3]
    raise NotImplementedError(f"TIFF photometric {photo} not supported")


_COMP_TAGS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def encode_tiff(
    pixels: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """RGB8 chunky little-endian baseline TIFF writer (fixtures / round-trip
    counterpart of ``decode_tiff`` — independent table/run construction)."""
    comp = _COMP_TAGS[compression]
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("predictor only pairs with LZW/Deflate")
    h, w, _ = pixels.shape
    rps = rows_per_strip or h
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        block = pixels[y0 : y0 + rps].astype(np.uint8)
        if predictor:
            d = block.astype(np.int16)
            d[:, 1:] -= block[:, :-1].astype(np.int16)
            block = (d & 0xFF).astype(np.uint8)
        raw = block.tobytes()
        if comp == 1:
            strips.append(raw)
        elif comp == 5:
            strips.append(_lzw_encode(raw))
        elif comp == 8:
            strips.append(zlib.compress(raw))
        else:
            strips.append(_packbits(raw))

    n_strips = len(strips)
    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, count, value4

    def short(v: int) -> bytes:
        return struct.pack("<HH", v, 0)

    def long_(v: int) -> bytes:
        return struct.pack("<I", v)

    # layout: header(8) | IFD | out-of-line values | strip data
    n_entries = 11 + (1 if predictor else 0)
    ifd_size = 2 + 12 * n_entries + 4
    extra_off = 8 + ifd_size
    bps_off = extra_off  # 3 SHORTs
    offsets_off = bps_off + 6
    counts_off = offsets_off + 4 * n_strips
    data_start = bps_off + 6 + (8 * n_strips if n_strips > 1 else 0)
    offs = []
    pos = data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    extra = bytearray(struct.pack("<HHH", 8, 8, 8))
    if n_strips > 1:
        extra.extend(struct.pack(f"<{n_strips}I", *offs))
        extra.extend(struct.pack(f"<{n_strips}I", *map(len, strips)))

    entries.append((256, 4, 1, long_(w)))
    entries.append((257, 4, 1, long_(h)))
    entries.append((258, 3, 3, long_(bps_off)))
    entries.append((259, 3, 1, short(comp)))
    entries.append((262, 3, 1, short(2)))  # RGB
    entries.append(
        (273, 4, n_strips, long_(offs[0]) if n_strips == 1 else long_(offsets_off))
    )
    entries.append((277, 3, 1, short(3)))
    entries.append((278, 4, 1, long_(rps)))
    entries.append(
        (
            279,
            4,
            n_strips,
            long_(len(strips[0])) if n_strips == 1 else long_(counts_off),
        )
    )
    entries.append((284, 3, 1, short(1)))  # chunky
    if predictor:
        entries.append((317, 3, 1, short(2)))
    entries.append((296, 3, 1, short(1)))  # ResolutionUnit: none

    entries.sort()
    out = bytearray(struct.pack("<4sI", b"II*\x00", 8))
    out += struct.pack("<H", len(entries))
    for tag, ftype, count, val in entries:
        out += struct.pack("<HHI", tag, ftype, count) + val
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
