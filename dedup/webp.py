"""Pure-stdlib/numpy lossless-WebP (VP8L) codec — the public spec
(RFC 9649 / "WebP Lossless Bitstream Specification").

Closes the WebP seam of the multimodal path: VP8L is Huffman + 2D-LZ77 +
reversible pixel transforms, so — like the PNG, GIF, baseline-JPEG and
FLAC codecs in this repo — it decodes for real inside ``featurize_media``
without PIL/cv2. Lossy WebP (VP8 intra-frame coding: boolean arithmetic
coder + DCT + loop filter) is decoded by dedup/vp8.py (RFC 6386 keyframe
decoder, verified bit-exact at the YUV surface against the system libwebp)
and dispatched from ``decode_webp`` below.

Decoder implements the full still-image stream: all four transforms
(predictor with its 14 modes, color, subtract-green, color-indexing with
sub-byte pixel bundling), color cache, meta-Huffman entropy images, the
simple and normal (code-length-coded) Huffman classes, and the 120-entry
2D distance map. Encoder is an independent literal-only single-group
writer (real per-channel canonical Huffman with zero-run code-length
coding — NOT the decoder inverted), so round-trip tests prove spec
conformance of both framing directions; targeted bitstreams built by the
tests exercise the decoder paths the encoder never emits (cache, LZ77,
transforms, bundling).

Scale shape: payload-at-a-time inside mapInPandas Arrow batches; the
entropy loops are per-payload Python dict lookups — the intrinsically
serial kernel the brief assigns to Pandas-UDF workers; payloads are
independent across partitions.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- bit io


class BitReader:
    """LSB-first bit reader over bytes (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # in bits

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bit = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def getvalue(self) -> bytes:
        return bytes(self.out)


# ------------------------------------------------------------- huffman

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical convention."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


class HuffDecoder:
    """Bit-at-a-time canonical decoder; (length, code) -> symbol map.
    A zero-bit decoder (single used symbol) consumes nothing."""

    def __init__(self, lengths: list[int]):
        used = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if len(used) == 0:
            raise ValueError("huffman code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0][0]
            self.map: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.map = {
            (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
        }

    def read_symbol(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("invalid huffman code")

    @classmethod
    def single_symbol(cls, sym: int) -> "HuffDecoder":
        d = cls.__new__(cls)
        d.single = sym
        d.map = {}
        return d

    @classmethod
    def two_symbols(cls, s0: int, s1: int) -> "HuffDecoder":
        """Simple 2-symbol code: stream order decides the codes (first
        symbol -> 0), NOT the canonical symbol-value order."""
        d = cls.__new__(cls)
        d.single = None
        d.map = {(1, 0): s0, (1, 1): s1}
        return d


def _read_huffman_code(br: BitReader, alphabet: int) -> HuffDecoder:
    if br.read(1):  # simple code
        n = br.read(1) + 1
        if br.read(1):
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if n == 1:
            return HuffDecoder.single_symbol(s0)
        s1 = br.read(8)
        return HuffDecoder.two_symbols(s0, s1)
    # normal: code lengths coded with the code-length code
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = HuffDecoder(cl_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    symbol = 0
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        code_len = cl_dec.read_symbol(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, val = br.read(2) + 3, prev_len
            elif code_len == 17:
                repeat, val = br.read(3) + 3, 0
            else:
                repeat, val = br.read(7) + 11, 0
            for _ in range(repeat):
                if symbol >= alphabet:
                    break
                lengths[symbol] = val
                symbol += 1
    return HuffDecoder(lengths)


# ----------------------------------------------------- lz77 distance map

# 2D locality map from the spec: distance codes 1..120 address pixels in
# the 8-neighborhood window above/left; codes >120 are linear - 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120


def _plane_code_to_distance(xsize: int, dist_code: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    dist = dx + dy * xsize
    return dist if dist >= 1 else 1


def _read_prefix_value(br: BitReader, prefix_sym: int) -> int:
    if prefix_sym < 4:
        return prefix_sym + 1
    extra = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra
    return offset + br.read(extra) + 1


# ------------------------------------------------------------ transforms

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEX = 0, 1, 2, 3


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, L, T, TL, TR) -> tuple[int, int, int, int]:
    """Per-channel prediction (A,R,G,B tuples)."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(_avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4))
    if mode == 6:
        return tuple(_avg2(L[i], TL[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(L[i], T[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(TL[i], T[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(T[i], TR[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i])) for i in range(4)
        )
    if mode == 11:  # select
        p_l = sum(abs(T[i] - TL[i]) for i in range(4))
        p_t = sum(abs(L[i] - TL[i]) for i in range(4))
        return L if p_l < p_t else T
    if mode == 12:  # clamp-add-subtract-full
        return tuple(
            max(0, min(255, L[i] + T[i] - TL[i])) for i in range(4)
        )
    if mode == 13:  # clamp-add-subtract-half
        return tuple(
            max(
                0,
                min(
                    255,
                    (a := _avg2(L[i], T[i])) + ((a - TL[i]) >> 1),
                ),
            )
            for i in range(4)
        )
    raise ValueError(f"bad predictor mode {mode}")


def _inverse_predictor(img: np.ndarray, modes: np.ndarray, bits: int) -> None:
    """In-place inverse of the predictor transform. img is (h, w, 4) ARGB
    residuals; modes is the block-resolution mode image (green channel)."""
    h, w = img.shape[:2]
    blk = 1 << bits
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1  # left
            elif x == 0:
                mode = 2  # top
            else:
                mode = int(modes[y >> bits, x >> bits])
            L = tuple(int(v) for v in img[y, x - 1]) if x > 0 else (0, 0, 0, 0)
            T = tuple(int(v) for v in img[y - 1, x]) if y > 0 else (0, 0, 0, 0)
            TL = (
                tuple(int(v) for v in img[y - 1, x - 1])
                if (x > 0 and y > 0)
                else (0, 0, 0, 0)
            )
            if y > 0 and x + 1 < w:
                TR = tuple(int(v) for v in img[y - 1, x + 1])
            elif y > 0:
                # rightmost column: raster-contiguous addressing makes the
                # "top-right" pixel the first pixel of the current row
                TR = tuple(int(v) for v in img[y, 0])
            else:
                TR = T
            pred = _predict(mode, L, T, TL, TR)
            for c in range(4):
                img[y, x, c] = (int(img[y, x, c]) + pred[c]) & 0xFF


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: signed int8 multiply >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(img: np.ndarray, cte: np.ndarray, bits: int) -> None:
    """In-place inverse color transform. cte pixels hold (in ARGB layout)
    red_to_blue in the red channel, green_to_blue in green, green_to_red
    in blue."""
    h, w = img.shape[:2]
    for y in range(h):
        for x in range(w):
            e = cte[y >> bits, x >> bits]
            g2r, g2b, r2b = int(e[3]), int(e[2]), int(e[1])
            g = int(img[y, x, 2])
            r = (int(img[y, x, 1]) + _ctd(g2r, g)) & 0xFF
            b = (int(img[y, x, 3]) + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
            img[y, x, 1] = r
            img[y, x, 3] = b


# --------------------------------------------------------------- decoder


def _decode_image_stream(
    br: BitReader, w: int, h: int, top_level: bool
) -> np.ndarray:
    """Decode one VP8L image stream into an (h, w, 4) uint8 ARGB array."""
    transforms: list[tuple[int, object]] = []
    cur_w = w
    if top_level:
        while br.read(1):
            ttype = br.read(2)
            if ttype in (_T_PREDICTOR, _T_COLOR):
                bits = br.read(3) + 2
                bw = (cur_w + (1 << bits) - 1) >> bits
                bh = (h + (1 << bits) - 1) >> bits
                sub = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, (bits, sub)))
            elif ttype == _T_SUBTRACT_GREEN:
                transforms.append((ttype, None))
            elif ttype == _T_COLOR_INDEX:
                n_colors = br.read(8) + 1
                pal_img = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are stored delta-coded left-to-right
                pal = pal_img[0].astype(np.int32)
                for i in range(1, n_colors):
                    pal[i] = (pal[i] + pal[i - 1]) & 0xFF
                pal = pal.astype(np.uint8)
                if n_colors <= 2:
                    pbits = 3  # 1 bit/pixel -> 8 per byte
                elif n_colors <= 4:
                    pbits = 2
                elif n_colors <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append((ttype, (pal, pbits, cur_w)))
                cur_w = (cur_w + (1 << pbits) - 1) >> pbits
            else:
                raise ValueError("bad transform type")

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not (1 <= cache_bits <= 11):
        raise ValueError("bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    use_meta = br.read(1) if top_level else 0
    if use_meta:
        mbits = br.read(3) + 2
        mw = (cur_w + (1 << mbits) - 1) >> mbits
        mh = (h + (1 << mbits) - 1) >> mbits
        entropy = _decode_image_stream(br, mw, mh, False)
        group_idx = (
            entropy[:, :, 1].astype(np.int32) << 8
        ) | entropy[:, :, 2].astype(np.int32)
        n_groups = int(group_idx.max()) + 1
    else:
        mbits = 0
        group_idx = None
        n_groups = 1

    alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = []
    for _ in range(n_groups):
        groups.append([_read_huffman_code(br, a) for a in alphabets])

    n_px = cur_w * h
    argb = np.zeros((n_px, 4), dtype=np.uint8)  # A,R,G,B
    pos = 0
    while pos < n_px:
        if group_idx is not None:
            y, x = divmod(pos, cur_w)
            g = groups[int(group_idx[y >> mbits, x >> mbits])]
        else:
            g = groups[0]
        sym = g[0].read_symbol(br)
        if sym < 256:  # literal
            green = sym
            red = g[1].read_symbol(br)
            blue = g[2].read_symbol(br)
            alpha = g[3].read_symbol(br)
            argb[pos] = (alpha, red, green, blue)
            pos += 1
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
        elif sym < 256 + 24:  # back-reference
            length = _read_prefix_value(br, sym - 256)
            dist_code = _read_prefix_value(br, g[4].read_symbol(br))
            dist = _plane_code_to_distance(cur_w, dist_code)
            if dist > pos:
                raise ValueError("lz77 distance before start")
            for _ in range(length):
                if pos >= n_px:
                    raise ValueError("lz77 overrun")
                argb[pos] = argb[pos - dist]
                pos += 1
                if cache_size:
                    a, r, gg, b = (int(v) for v in argb[pos - 1])
                    px = (a << 24) | (r << 16) | (gg << 8) | b
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            continue
        else:  # color-cache hit
            px = cache[sym - 256 - 24]
            argb[pos] = ((px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)
            pos += 1
        if cache_size:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    img = argb.reshape(h, cur_w, 4)

    for ttype, data in reversed(transforms):
        if ttype == _T_SUBTRACT_GREEN:
            g = img[:, :, 2].astype(np.int32)
            img[:, :, 1] = ((img[:, :, 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
            img[:, :, 3] = ((img[:, :, 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)
        elif ttype == _T_COLOR_INDEX:
            pal, pbits, full_w = data
            if pbits:
                per = 1 << pbits
                bpp = 8 >> pbits
                idx = np.zeros((h, full_w), dtype=np.int32)
                packed = img[:, :, 2].astype(np.int32)
                for x in range(full_w):
                    idx[:, x] = (packed[:, x >> pbits] >> ((x & (per - 1)) * bpp)) & (
                        (1 << bpp) - 1
                    )
            else:
                idx = img[:, :, 2].astype(np.int32)
            oob = idx >= len(pal)
            out = pal[np.clip(idx, 0, len(pal) - 1)]
            out[oob] = 0
            img = out
        elif ttype == _T_PREDICTOR:
            bits, sub = data
            _inverse_predictor(img, sub[:, :, 2], bits)
        elif ttype == _T_COLOR:
            bits, sub = data
            _inverse_color_transform(img, sub, bits)
    return img


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA array."""
    br = BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")
    argb = _decode_image_stream(br, w, h, True)
    return argb[:, :, [1, 2, 3, 0]].copy()  # ARGB -> RGBA


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WEBP container -> (h, w, 4) uint8 RGBA (lossless files only)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(payload)
        if fourcc == b"VP8 ":
            from .vp8 import decode_vp8, yuv_to_rgb

            y, u, v = decode_vp8(payload)
            rgb = yuv_to_rgb(y, u, v)
            rgba = np.empty((*y.shape, 4), np.uint8)
            rgba[:, :, :3] = rgb
            rgba[:, :, 3] = 255
            return rgba
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L/VP8 chunk in WebP container")


# --------------------------------------------------------------- encoder


def _huff_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Canonical Huffman code lengths from frequencies (heap merge with
    zlib-style overflow fix-up to the 15-bit VP8L limit)."""
    import heapq

    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) <= 1:
        return {s: 1 for s in syms}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(freqs.items()) if f > 0]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, g1 + g2))
        i += 1
    if max(depth.values()) > max_len:
        # clamp and repair the Kraft sum
        for s in depth:
            depth[s] = min(depth[s], max_len)
        while sum(2 ** (max_len - l) for l in depth.values()) > (1 << max_len):
            # lengthen the deepest symbol that can still grow
            s = min(
                (s for s in depth if depth[s] < max_len),
                key=lambda s: freqs[s],
            )
            depth[s] += 1
    return depth


def _write_huffman_code(
    bw: BitWriter, lengths_map: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    """Emit a huffman code declaration; return symbol -> (code, length)."""
    used = sorted(lengths_map)
    if len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        if not used:
            used = [0]
        bw.write(len(used) - 1, 1)
        if used[0] >= 2:
            bw.write(1, 1)
            bw.write(used[0], 8)
        else:
            bw.write(0, 1)
            bw.write(used[0], 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}

    bw.write(0, 1)  # normal
    lengths = [0] * alphabet
    for s, l in lengths_map.items():
        lengths[s] = l
    # run-length code the lengths (zeros via 17/18)
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    while i < alphabet:
        if lengths[i] == 0:
            j = i
            while j < alphabet and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 3:
                if run >= 11:
                    r = min(run, 138)
                    tokens.append((18, r - 11, 7))
                else:
                    r = min(run, 10)
                    tokens.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    # trailing zero tokens can be dropped IF the explicit max_symbol limit
    # tells the reader how many coded symbols to expect
    full_count = len(tokens)
    while len(tokens) >= 3 and tokens[-1][0] in (0, 17, 18):
        tokens.pop()
    use_limit = len(tokens) < full_count
    cl_freq: dict[int, int] = {}
    for t, _, _ in tokens:
        cl_freq[t] = cl_freq.get(t, 0) + 1
    cl_lengths = _huff_lengths(cl_freq, max_len=7)
    full = [0] * 19
    for s, l in cl_lengths.items():
        full[s] = l
    num_cl = max(
        (i + 1 for i, s in enumerate(_CL_ORDER) if full[s] > 0), default=4
    )
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(full[_CL_ORDER[i]], 3)
    if use_limit:
        bw.write(1, 1)
        nbits = max(2, (len(tokens) - 2).bit_length())
        nbits += nbits & 1  # the field width is 2 + 2*k
        bw.write((nbits - 2) // 2, 3)
        bw.write(len(tokens) - 2, nbits)
    else:
        bw.write(0, 1)
    cl_codes = _canonical_codes(full)
    if len(cl_codes) == 1:
        # a 1-symbol code is zero bits on the wire (the decoder consumes
        # nothing per symbol) — extra bits of 17/18 runs still follow
        cl_codes = {s: (0, 0) for s in cl_codes}
    for t, extra, ebits in tokens:
        code, ln = cl_codes[t]
        for b in range(ln - 1, -1, -1):
            bw.write((code >> b) & 1, 1)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def encode_vp8l(rgba: np.ndarray, subtract_green: bool = True) -> bytes:
    """(h, w, 3|4) uint8 -> VP8L chunk payload (literal-only stream,
    optionally through the subtract-green transform — the cheap
    decorrelator that shrinks natural images' red/blue alphabets)."""
    if rgba.ndim != 3 or rgba.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 array")
    h, w = rgba.shape[:2]
    if rgba.shape[2] == 3:
        a = np.full((h, w, 1), 255, dtype=np.uint8)
        rgba = np.concatenate([rgba, a], axis=2)
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if bool((rgba[:, :, 3] != 255).any()) else 0, 1)
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(_T_SUBTRACT_GREEN, 2)
        rgba = rgba.copy()
        g = rgba[:, :, 1].astype(np.int32)
        rgba[:, :, 0] = ((rgba[:, :, 0].astype(np.int32) - g) & 0xFF).astype(np.uint8)
        rgba[:, :, 2] = ((rgba[:, :, 2].astype(np.int32) - g) & 0xFF).astype(np.uint8)
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman

    flat = rgba.reshape(-1, 4)
    chans = {
        "g": flat[:, 1].astype(np.int64),
        "r": flat[:, 0].astype(np.int64),
        "b": flat[:, 2].astype(np.int64),
        "a": flat[:, 3].astype(np.int64),
    }
    freqs = {
        k: dict(zip(*[arr.tolist() for arr in np.unique(v, return_counts=True)]))
        for k, v in chans.items()
    }
    codes = {}
    for key, alphabet in (("g", 280), ("r", 256), ("b", 256), ("a", 256)):
        codes[key] = _write_huffman_code(
            bw, _huff_lengths(freqs[key]), alphabet
        )
    _write_huffman_code(bw, {}, 40)  # distance tree: unused

    def emit(key: str, sym: int) -> None:
        code, ln = codes[key][sym]
        for b in range(ln - 1, -1, -1):
            bw.write((code >> b) & 1, 1)

    for px in flat:
        emit("g", int(px[1]))
        emit("r", int(px[0]))
        emit("b", int(px[2]))
        emit("a", int(px[3]))
    return bw.getvalue()


def encode_webp(rgba: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> complete lossless .webp file bytes."""
    payload = encode_vp8l(rgba)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
