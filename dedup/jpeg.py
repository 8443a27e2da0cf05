"""Pure-numpy baseline JPEG decoder (public spec ITU-T.81 / JFIF).

Closes the last media-decode stub reachable offline (VERDICT r3 #5): the
container has no PIL/cv2/libjpeg, but baseline sequential DCT JPEGs are
fully decodable with stdlib + numpy — marker parse, canonical Huffman
entropy decode (16-bit lookahead table), dequantize, separable 8x8 IDCT as
two matrix multiplies, chroma upsampling, and JFIF YCbCr→RGB.

Scope: baseline (SOF0), extended-sequential (SOF1), progressive (SOF2),
arithmetic-coded (SOF9/SOF10, via dedup/jpeg_arith.py's QM coder), and
predictive lossless (SOF3, via dedup/jpeg_lossless.py) JPEGs with integer
subsampling ratios — the overwhelming majority of real-world files plus
the arithmetic and lossless long tails. Progressive scans implement
spectral selection, successive approximation, and EOB-run coding
(ITU-T.81 G.2), accumulating coefficients across scans before one
vectorized IDCT. Hierarchical variants raise NotImplementedError at a
single guarded branch, same policy as the other decoders in
multimodal.py.
"""

from __future__ import annotations

import numpy as np

# zigzag index -> natural (row-major) index
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: spatial = A.T @ coef @ A
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


# Annex K.1/K.2 example quantization tables (natural order), used by the
# encoder at quality=50; scaled by the standard IJG quality formula
_K1_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_K2_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K.3 example Huffman tables: (BITS counts, HUFFVAL symbols)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    bytes(
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
            0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
            0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
            0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
            0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
            0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
            0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
            0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
            0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
            0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ]
    ),
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    bytes(
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
            0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
            0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
            0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
            0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
            0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
            0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
            0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
            0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
            0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
            0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ]
    ),
)


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment; reads past
    the end return 1-bits (the spec's pad value), which terminates any
    trailing partial block at EOB."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self._fill(n)
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1
        return v


def _build_huff(counts: list[int], symbols: bytes):
    """Canonical Huffman -> 16-bit lookahead LUTs (symbol, code length)."""
    sym_lut = np.full(1 << 16, -1, dtype=np.int16)
    len_lut = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym_lut[lo:hi] = symbols[k]
            len_lut[lo:hi] = length
            k += 1
            code += 1
        code <<= 1
    return sym_lut, len_lut


def _extend(v: int, n: int) -> int:
    """DC/AC magnitude category decode (ITU-T.81 F.2.2.1 EXTEND)."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuffed entropy byte runs between RST markers, plus the index of
    the terminating marker (EOI or the next header)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> HxWx3 uint8 RGB (grayscale replicated to 3 chans)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None
    restart = 0
    i = 2
    scan = None
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        L = int.from_bytes(data[i : i + 2], "big")
        seg = data[i + 2 : i + L]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                else:
                    tab = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                nat = np.empty(64)
                nat[_ZIGZAG] = tab
                qt[tq] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline / extended seq.
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # SOF2: progressive Huffman — own scan loop
            return _decode_progressive(data)
        elif marker in (0xC9, 0xCA):  # SOF9/SOF10: arithmetic — own scan loop
            from dedup.jpeg_arith import decode_arith_jpeg

            return decode_arith_jpeg(data)
        elif marker == 0xC3:  # SOF3: predictive lossless — own scan loop
            from dedup.jpeg_lossless import decode_lossless_jpeg

            samples, prec = decode_lossless_jpeg(data)
            if prec > 8:  # scale to 8-bit like the 16-bit PPM path
                mx = (1 << prec) - 1
                samples = (samples.astype(np.uint32) * 255 + mx // 2) // mx
            px = samples.astype(np.uint8)
            if px.shape[2] == 1:
                return np.dstack([px[:, :, 0]] * 3)
            # lossless JPEGs carry no JFIF color transform in practice
            # (DNG/medical): 3 components are stored as-is, i.e. RGB
            return px[:, :, :3]
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline/extended-sequential/progressive/arithmetic-"
                f"DCT and sequential-lossless JPEG is supported (SOF marker "
                f"0xFF{marker:02X}: hierarchical variants and arithmetic "
                "lossless need a codec library)"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(counts, symbols)
                p += 17 + total
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tabs >> 4, "ac": tabs & 15})
            segs, _ = _entropy_segments(data, i + L)
            break
        i += L
    if frame is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for c, s in zip(order, scan):
        c["dct"], c["act"] = huff_dc[s["dc"]], huff_ac[s["ac"]]
        c["q"] = qt[c["tq"]]
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["pred"] = 0

    n_mcu = mcux * mcuy
    per_seg = restart if restart else n_mcu
    mcu = 0
    for seg_bytes in segs:
        if mcu >= n_mcu:
            break
        br = _BitReader(seg_bytes)
        for c in order:
            c["pred"] = 0  # restart resets DC prediction
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in order:
                dsym, dlen = c["dct"]
                asym, alen = c["act"]
                q = c["q"]
                plane = c["plane"]
                for blk in range(c["h"] * c["v"]):
                    bv, bh = divmod(blk, c["h"])
                    coef = np.zeros(64)
                    # DC
                    pk = br.peek16()
                    s = int(dsym[pk])
                    br.skip(int(dlen[pk]))
                    c["pred"] += _extend(br.receive(s), s)
                    coef[0] = c["pred"]
                    # AC
                    k = 1
                    while k < 64:
                        pk = br.peek16()
                        rs = int(asym[pk])
                        br.skip(int(alen[pk]))
                        r, size = rs >> 4, rs & 15
                        if size == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            break
                        coef[_ZIGZAG[k]] = _extend(br.receive(size), size)
                        k += 1
                    spatial = _A.T @ (coef.reshape(8, 8) * q) @ _A + 128.0
                    y0 = (my * c["v"] + bv) * 8
                    x0 = (mx * c["h"] + bh) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu += 1

    return _planes_to_rgb(frame, comps, hmax, vmax)


def _planes_to_rgb(frame, comps, hmax: int, vmax: int) -> np.ndarray:
    """Shared decode tail: upsample each component's float plane to full
    resolution, crop to the frame, JFIF YCbCr->RGB."""
    H, W = frame["h"], frame["w"]
    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] != hmax or c["v"] != vmax:
            if hmax % c["h"] or vmax % c["v"]:
                raise NotImplementedError("non-integer chroma subsampling ratio")
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:H, :W])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def _hdecode(br: _BitReader, tab) -> int:
    sym, ln = tab
    pk = br.peek16()
    s = int(sym[pk])
    if s < 0:
        raise ValueError("invalid Huffman code in entropy stream")
    br.skip(int(ln[pk]))
    return s


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive (SOF2) Huffman JPEG -> HxWx3 uint8 RGB (ITU-T.81 G.2).

    Coefficients accumulate across scans: DC first/refinement scans walk
    the interleaved MCU grid; AC scans are always single-component and
    walk the component's own block raster with spectral selection
    [Ss, Se], successive-approximation shifts (Al), and EOB-run coding.
    After the last scan every block is dequantized and inverse-DCT'd in
    one vectorized einsum per component."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    frame = None
    restart = 0
    geom = None  # (hmax, vmax, mcux, mcuy) once the frame is known
    i = 2
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        L = int.from_bytes(data[i : i + 2], "big")
        seg = data[i + 2 : i + L]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                else:
                    tab = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                nat = np.empty(64)
                nat[_ZIGZAG] = tab
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC2:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            geom = (hmax, vmax, mcux, mcuy)
            for c in comps:
                bw_full, bh_full = mcux * c["h"], mcuy * c["v"]
                # true (non-MCU-padded) block dims for non-interleaved scans
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
                c["bw_full"], c["bh_full"] = bw_full, bh_full
                c["coef"] = np.zeros((bh_full, bw_full, 64), dtype=np.int32)
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(counts, symbols)
                p += 17 + total
        elif marker == 0xDD:
            restart = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tabs >> 4, "ac": tabs & 15})
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            segs, end = _entropy_segments(data, i + L)
            _progressive_scan(
                frame, geom, scan, ss, se, ah, al, huff_dc, huff_ac, restart, segs
            )
            i = end
            continue
        i += L
    if frame is None:
        raise ValueError("truncated JPEG: missing SOF2")

    hmax, vmax, _, _ = geom
    comps = frame["comps"]
    for c in comps:
        q = qt[c["tq"]]
        blocks = c["coef"].astype(np.float64).reshape(
            c["bh_full"], c["bw_full"], 8, 8
        ) * q
        spatial = np.einsum("ij,xyjk,kl->xyil", _A.T, blocks, _A) + 128.0
        c["plane"] = spatial.transpose(0, 2, 1, 3).reshape(
            c["bh_full"] * 8, c["bw_full"] * 8
        )
    return _planes_to_rgb(frame, comps, hmax, vmax)


def _progressive_scan(
    frame, geom, scan, ss, se, ah, al, huff_dc, huff_ac, restart, segs
) -> None:
    """Apply one progressive scan's entropy segments to the accumulated
    coefficient arrays (DC: F.2.2.1 + G.1.2.1; AC: G.1.2.2 / G.1.2.3)."""
    hmax, vmax, mcux, mcuy = geom
    by_id = {c["id"]: c for c in frame["comps"]}
    order = [by_id[s["id"]] for s in scan]
    interleaved = len(order) > 1
    if interleaved:
        total_units = mcux * mcuy
    else:
        c0 = order[0]
        total_units = c0["bw"] * c0["bh"]
    for c, s in zip(order, scan):
        if ss == 0:
            c["dct"] = huff_dc[s["dc"]]
        if se > 0:
            c["act"] = huff_ac[s["ac"]]
        c["pred"] = 0
    per_seg = restart if restart else total_units
    p1, m1 = 1 << al, -1 << al
    unit = 0
    for seg_bytes in segs:
        if unit >= total_units:
            break
        br = _BitReader(seg_bytes)
        eobrun = 0
        for c in order:
            c["pred"] = 0
        for _ in range(min(per_seg, total_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for c in order:
                    for blk in range(c["h"] * c["v"]):
                        bv, bh = divmod(blk, c["h"])
                        coef = c["coef"][my * c["v"] + bv, mx * c["h"] + bh]
                        _decode_dc(br, c, coef, ah, al)
            else:
                c = order[0]
                by, bx = divmod(unit, c["bw"])
                coef = c["coef"][by, bx]
                if ss == 0:
                    _decode_dc(br, c, coef, ah, al)
                elif ah == 0:
                    eobrun = _ac_first(br, c, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, c, coef, ss, se, p1, m1, eobrun)
            unit += 1


def _decode_dc(br: _BitReader, c, coef, ah: int, al: int) -> None:
    if ah == 0:  # DC first: diff-coded magnitude, shifted by Al
        s = _hdecode(br, c["dct"])
        c["pred"] += _extend(br.receive(s), s)
        coef[0] = c["pred"] << al
    else:  # DC refinement: one correction bit per block
        if br.receive(1):
            coef[0] = int(coef[0]) | (1 << al)


def _ac_first(br: _BitReader, c, coef, ss, se, al, eobrun: int) -> int:
    """AC scan, Ah=0 (G.1.2.2): band [ss, se] with EOB-run coding."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _hdecode(br, c["act"])
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            break  # corrupt stream guard
        coef[_ZIGZAG[k]] = _extend(br.receive(size), size) << al
        k += 1
    return eobrun


def _ac_refine(br: _BitReader, c, coef, ss, se, p1, m1, eobrun: int) -> int:
    """AC refinement, Ah>0 (G.1.2.3): each already-nonzero coefficient in
    the band gets a correction bit; zero-history positions are spent by
    the run lengths and may become +-2^Al."""

    def correct(idx) -> None:
        v = int(coef[idx])
        if br.receive(1) and not (v & p1):
            coef[idx] = v + (p1 if v >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _hdecode(br, c["act"])
            r, size = rs >> 4, rs & 15
            newval = 0
            if size == 0:
                if r < 15:
                    # unlike _ac_first, NO -1 here: the current block's tail
                    # still consumes correction bits below, and the run is
                    # decremented after that (ITU-T.81 G.1.2.3 / IJG)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: pass over 16 zero-history positions
            else:
                # size is always 1 in refinement scans
                newval = p1 if br.receive(1) else m1
            while k <= se:
                idx = _ZIGZAG[k]
                if coef[idx] != 0:
                    correct(idx)
                else:
                    if r == 0:
                        if newval:
                            coef[idx] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            idx = _ZIGZAG[k]
            if coef[idx] != 0:
                correct(idx)
            k += 1
        eobrun -= 1
    return eobrun


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (ITU-T.81 B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def align(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


def _huff_encode_table(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """Canonical codes: symbol -> (code, length)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling; quality=100 -> all-ones (near-lossless)."""
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_baseline_jpeg(
    pixels: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """HxWx3 RGB (or HxW grayscale) uint8 -> baseline JFIF JPEG bytes.

    4:4:4 (no subsampling), Annex K quantization/Huffman tables, optional
    restart markers every `restart_interval` MCUs. At quality=100 the
    quantization tables are all ones, so decode(encode(x)) differs from x
    only by DCT float rounding — the basis of the round-trip tests.
    """
    gray = pixels.ndim == 2 or pixels.shape[2] == 1
    if gray:
        planes = [pixels.reshape(pixels.shape[0], pixels.shape[1]).astype(np.float64)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    H, W = planes[0].shape
    ph, pw = -(-H // 8) * 8, -(-W // 8) * 8
    planes = [
        np.pad(p, ((0, ph - H), (0, pw - W)), mode="edge") for p in planes
    ]

    qs = [_scaled_quant(_K1_LUMA, quality).reshape(8, 8)]
    if not gray:
        qs.append(_scaled_quant(_K2_CHROMA, quality).reshape(8, 8))
    dc_tabs = [_huff_encode_table(*_DC_LUMA)]
    ac_tabs = [_huff_encode_table(*_AC_LUMA)]
    if not gray:
        dc_tabs.append(_huff_encode_table(*_DC_CHROMA))
        ac_tabs.append(_huff_encode_table(*_AC_CHROMA))
    comp_tab = [0] if gray else [0, 1, 1]  # quant/huff table id per component

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    for tq, q in enumerate(qs):
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tq]) + zz.tobytes())
    nc = len(planes)
    sof = bytes([8]) + H.to_bytes(2, "big") + W.to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, comp_tab[c]])
    seg(0xC0, sof)
    for cls, tabs, spec in (
        (0, dc_tabs, (_DC_LUMA, _DC_CHROMA)),
        (1, ac_tabs, (_AC_LUMA, _AC_CHROMA)),
    ):
        for tid in range(len(tabs)):
            counts, vals = spec[tid]
            seg(0xC4, bytes([cls << 4 | tid]) + bytes(counts) + vals)
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, comp_tab[c] << 4 | comp_tab[c]])
    seg(0xDA, sos + bytes([0, 63, 0]))

    bw = _BitWriter()
    preds = [0] * nc
    mcux, mcuy = pw // 8, ph // 8
    rst = 0
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.out.extend(b"\xff" + bytes([0xD0 + rst]))
                rst = (rst + 1) % 8
                preds = [0] * nc
            for c, plane in enumerate(planes):
                block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                coef = _A @ (block - 128.0) @ _A.T
                q = qs[comp_tab[c]]
                zz = np.round(coef / q).astype(np.int64).reshape(64)[_ZIGZAG]
                dct, act = dc_tabs[comp_tab[c]], ac_tabs[comp_tab[c]]
                diff = int(zz[0]) - preds[c]
                preds[c] = int(zz[0])
                s = _category(diff)
                code, ln = dct[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = act[run << 4 | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = act[0x00]
                    bw.write(code, ln)
            mcu += 1
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
