"""Pure-stdlib/numpy GIF codec (GIF87a/89a, the public W3C/CompuServe spec).

Closes the palette-media seam of the multimodal path (SURVEY.md §2.10 /
task-brief multimodal columns): GIF is the one ubiquitous web image format
whose compression (LZW) needs no entropy-coding library, so — like the PNG,
baseline-JPEG, and FLAC codecs in this repo — it decodes for real inside
``featurize_media`` without PIL/cv2. Animated GIFs additionally feed the
video path: ``decode_gif_frames`` returns the fully composited frame stack
(disposal methods 0-3, transparency, local palettes, interlacing), shaped
exactly like ``gen_fake_video``'s ``array<binary>`` frame payloads, so
``sample_frames`` works on real animations.

Decoder and encoder are independent implementations of the spec (the
encoder is NOT the decoder inverted: it builds its own LZW string table and
emits its own framing), and tests/test_multimodal.py additionally verifies
both against the JVM ImageIO reference via Spark's image source — encoder
output decoded by ImageIO, ImageIO-written files decoded here — proving
spec conformance, not self-consistency.

Scale shape: runs batch-at-a-time inside mapInPandas (Arrow batches of
binary payloads); the LZW inner loops are per-payload Python over dict
lookups — acceptable because payload decode is the intrinsically
CPU-bound kernel the brief assigns to Pandas-UDF workers, and each payload
is independent (embarrassingly parallel across partitions).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF length-prefixed sub-blocks starting at pos; return
    (data, position after the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += b[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width from min_code_size+1 up to 12
    bits, CLEAR resets the table, growth defers at 4096 until the next
    CLEAR. Returns exactly n_pixels indices (extra trailing codes, which
    some encoders emit, are ignored per common practice)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole stream at once
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8)[:, None], axis=1, bitorder="little"
    ).ravel()
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    pos = 0
    total = len(bits)

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        if pos + width > total:
            raise ValueError("truncated GIF LZW stream")
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def decode_gif_frames(b: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF87a/89a payload to composited HxWx3
    uint8 arrays (logical-screen sized): local palettes, transparency,
    interlacing, and disposal methods 0-3 per the public spec."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg_idx, _ = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            data, pos = _read_sub_blocks(b, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code_size = b[pos]
        pos += 1
        data, pos = _read_sub_blocks(b, pos)
        idx = _lzw_decode(data, min_code_size, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        prev_region = canvas[top : top + fh, left : left + fw].copy()
        region = canvas[top : top + fh, left : left + fw]
        if transparent is None:
            region[:] = pal[idx]
        else:
            opaque = idx != transparent
            region[opaque] = pal[idx[opaque]]
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3:  # restore to previous
            canvas[top : top + fh, left : left + fw] = prev_region
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(b: bytes) -> np.ndarray:
    """First composited frame as HxWx3 uint8 (the still-image view)."""
    return decode_gif_frames(b)[0]


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Independent GIF LZW compressor: own string table keyed on
    (prefix_code, byte), table reset via CLEAR when full."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = clear + 2
    w.write(clear, width)
    data = indices.ravel().tolist()
    prefix = data[0]
    for sym in data[1:]:
        key = (prefix, sym)
        if key in table:
            prefix = table[key]
            continue
        w.write(prefix, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            w.write(clear, width)
            table.clear()
            next_code = clear + 2
            width = min_code_size + 1
        prefix = sym
    w.write(prefix, width)
    w.write(eoi, width)
    return w.finish()


def _interlace_rows(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    delay_cs: int = 10,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode one HxWx3 frame (still) or a list of same-shaped frames
    (animation) into a GIF89a payload. The palette is built from the
    union of colors across frames and must fit 256 entries (palette
    quantization is a modeling choice, not a codec concern — callers
    quantize first); animations get per-frame graphic-control blocks and
    a NETSCAPE2.0 loop extension."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    colors, inverse = np.unique(stack.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF palette overflow: {len(colors)} distinct colors > 256")
    # palette size = power of two >= max(2, n_colors); min LZW code size >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal_n = 1 << bits
    palette = np.zeros((pal_n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx_stack = inverse.astype(np.uint8).reshape(stack.shape[:3])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += palette.tobytes()
    if len(frames) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code_size = max(2, bits)
    for fi in range(len(frames)):
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        fpacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, fpacked)
        idx = idx_stack[fi]
        if interlace:
            idx = idx[_interlace_rows(h)]
        out.append(min_code_size)
        lzw = _lzw_encode(idx, min_code_size)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
