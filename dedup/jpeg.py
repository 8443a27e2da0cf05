"""Pure-numpy baseline JPEG decoder (public spec ITU-T.81 / JFIF).

Closes the last media-decode stub reachable offline (VERDICT r3 #5): the
container has no PIL/cv2/libjpeg, but baseline sequential DCT JPEGs are
fully decodable with stdlib + numpy — marker parse, canonical Huffman
entropy decode (16-bit lookahead table), dequantize, separable 8x8 IDCT as
two matrix multiplies, chroma upsampling, and JFIF YCbCr→RGB.

Scope: baseline (SOF0) and extended-sequential (SOF1) Huffman JPEGs with
integer subsampling ratios and 8-bit precision — the overwhelming majority
of real-world files. Progressive (SOF2), hierarchical, and arithmetic-coded
variants raise NotImplementedError at a single guarded branch, same policy
as the other decoders in multimodal.py.
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline/extended-sequential Huffman JPEG is supported "
                f"(SOF marker 0xFF{marker:02X}: progressive/hierarchical/"
                "arithmetic variants need a codec library)"
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
