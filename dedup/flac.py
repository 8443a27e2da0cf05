"""Pure-stdlib/numpy FLAC codec (public spec: RFC 9639 / xiph.org format
docs) — the lossless audio path of the media pipeline (SURVEY.md §2
multimodal scope; rides `audio.featurize_audio` like PCM WAV).

FLAC is a container + Rice-coded linear prediction — no perceptual/DSP
transform — so, like the baseline-JPEG and PNG paths, it is fully
decodable offline without external codec libraries. The decoder handles
the complete subframe set (CONSTANT / VERBATIM / FIXED orders 0-4 / LPC
orders 1-32), both Rice coding methods (4- and 5-bit parameters) with
escaped raw-bits partitions, wasted-bits shifts, and all four channel
assignments (independent, left/side, right/side, mid/side). The encoder
exists to make test fixtures without a codec library: fixed blocking,
CONSTANT / VERBATIM / FIXED-order-2 subframes with single-partition Rice
residuals, independent or mid/side stereo, correct CRC-8 / CRC-16 and
STREAMINFO MD5 — every bitstream it emits exercises the decoder's real
paths. Perceptual codecs (mp3/ogg-vorbis) remain external-library seams.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# ---------- CRCs (FLAC frame integrity; polys from the public spec) ----------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.empty(256, dtype=np.uint32)
    for i in range(256):
        r = i << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[i] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for byt in data:
        r = int(_CRC8_TAB[r ^ byt])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for byt in data:
        r = int(_CRC16_TAB[((r >> 8) ^ byt) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# ---------- bit reader ----------


class _Bits:
    """MSB-first bit reader: O(1) n-bit reads via int.from_bytes over the
    touched byte span; O(log n) unary reads via a precomputed set-bit
    position index (bit-by-bit unary scanning would be quadratic across a
    frame's Rice residuals)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit cursor
        self.n_bits = len(data) * 8
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(bits)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > self.n_bits:
            raise ValueError("FLAC bitstream truncated")
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[b0:b1], "big")
        v = (chunk >> ((b1 << 3) - end)) & ((1 << n) - 1)
        self.pos = end
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits up to and including the terminating 1 bit."""
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            raise ValueError("FLAC bitstream truncated in unary code")
        q = int(self.ones[i]) - self.pos
        self.pos = int(self.ones[i]) + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_coded_number(br: _Bits) -> int:
    """UTF-8-style variable-length frame/sample number (spec §9.1.5)."""
    b = br.read(8)
    if b < 0x80:
        return b
    n = 0
    while b & (0x80 >> n):
        n += 1
    v = b & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


# ---------- decoder ----------

_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATE_FIXED = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                      6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                      11: 96000}
_BPS_FIXED = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 + method
    escape = (1 << plen) - 1
    porder = br.read(4)
    out: list[int] = []
    for p in range(1 << porder):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                u = (br.unary() << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        x = [br.read_signed(eff)] * blocksize
    elif t == 1:  # VERBATIM
        x = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12 or t >= 32:  # FIXED order 0-4 / LPC order 1-32
        if t >= 32:
            order = t - 31
            warm = [br.read_signed(eff) for _ in range(order)]
            prec = br.read(4) + 1
            if prec == 16:
                raise ValueError("invalid LPC precision code")
            shift = br.read_signed(5)
            coefs = [br.read_signed(prec) for _ in range(order)]
        else:
            order = t - 8
            warm = [br.read_signed(eff) for _ in range(order)]
            shift = 0
            coefs = _FIXED_COEFS[order]
        res = _residual(br, blocksize, order)
        x = list(warm)
        for e in res:  # IIR restore — inherently sequential
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * x[-1 - j]
            x.append((acc >> shift) + e)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return np.asarray(x, dtype=np.int64) << wasted


def decode_flac(b: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (float samples in [-1, 1] shaped (n, channels),
    sample_rate). Pure stdlib/numpy; validates frame CRC-16 and the
    STREAMINFO MD5 when present."""
    if b[:4] != _MAGIC:
        raise ValueError("not a FLAC payload")
    i = 4
    streaminfo = None
    while True:  # metadata blocks
        hdr = b[i : i + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            streaminfo = b[i + 4 : i + 4 + size]
        i += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    fields = int.from_bytes(streaminfo[10:18], "big")
    si_rate = fields >> 44
    si_ch = ((fields >> 41) & 0x7) + 1
    si_bps = ((fields >> 36) & 0x1F) + 1
    total = fields & ((1 << 36) - 1)
    md5_ref = streaminfo[18:34]

    br = _Bits(b[i:])
    chans: list[list[np.ndarray]] = [[] for _ in range(si_ch)]
    got = 0
    while (total == 0 or got < total) and br.pos + 16 <= br.n_bits:
        frame_start = br.pos >> 3
        if br.read(14) != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        br.read(1)
        br.read(1)  # blocking strategy (frame vs sample number — both parsed)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        _read_coded_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        elif sr_code == 0:
            rate = si_rate
        else:
            rate = _SAMPLE_RATE_FIXED[sr_code]
        bps = si_bps if ss_code == 0 else _BPS_FIXED[ss_code]
        br.read(8)  # header CRC-8 (covered by the frame CRC-16 check below)

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_subframe(br, blocksize, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            # the difference (side) channel carries one extra bit
            a = _subframe(br, blocksize, bps + (1 if ch_code == 9 else 0))
            c = _subframe(br, blocksize, bps + (1 if ch_code != 9 else 0))
            if ch_code == 8:  # left/side: side = L - R
                subs = [a, a - c]
            elif ch_code == 9:  # right/side
                subs = [a + c, c]
            else:  # mid/side: mid = (L+R)>>1, side = L-R
                m2 = (a << 1) | (c & 1)
                subs = [(m2 + c) >> 1, (m2 - c) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        frame_end = br.pos >> 3
        want = br.read(16)
        if crc16(br.data[frame_start:frame_end]) != want:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for ci, s in enumerate(subs):
            chans[ci].append(s)
        got += blocksize

    x = np.stack(
        [np.concatenate(c) if c else np.zeros(0, dtype=np.int64) for c in chans],
        axis=1,
    )
    if total:
        x = x[:total]
    if md5_ref != b"\x00" * 16:
        width = (si_bps + 7) // 8
        dt = {1: "<i1", 2: "<i2", 4: "<i4"}.get(width)
        if dt is not None:
            raw = x.astype(dt).tobytes()
            if hashlib.md5(raw).digest() != md5_ref:
                raise ValueError("FLAC STREAMINFO MD5 mismatch")
    return x.astype(np.float64) / float(1 << (si_bps - 1)), si_rate or 1


# ---------- encoder (fixture generator; every path feeds the decoder) ----------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _coded_number(v: int) -> bytes:
    """Inverse of `_read_coded_number` (UTF-8-generalized, up to 36 bits)."""
    if v < 0x80:
        return bytes([v])
    for n_cont, limit, lead in (
        (1, 0x800, 0xC0), (2, 0x10000, 0xE0), (3, 0x200000, 0xF0),
        (4, 0x4000000, 0xF8), (5, 0x80000000, 0xFC), (6, 1 << 36, 0xFE),
    ):
        if v < limit:
            cont = [0x80 | ((v >> (6 * i)) & 0x3F) for i in range(n_cont)]
            return bytes([lead | (v >> (6 * n_cont))] + cont[::-1])
    raise ValueError("coded number out of range")


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res)
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_subframe(
    w: _BitWriter,
    x: np.ndarray,
    bps: int,
    force_verbatim: bool,
    as_lpc: bool = False,
    use_wasted: bool = False,
) -> None:
    xs = [int(v) for v in x]
    wasted = 0
    if use_wasted and any(xs):
        wasted = min(8, min((v & -v).bit_length() - 1 for v in xs if v))

    def _header(sf_type: int) -> None:
        w.write(0, 1)
        w.write(sf_type, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    eff = bps - wasted
    if wasted:
        xs = [v >> wasted for v in xs]
    if not force_verbatim and len(set(xs)) == 1:
        _header(0)  # CONSTANT
        w.write(xs[0], eff)
        return
    if force_verbatim or len(xs) < 3:
        _header(1)  # VERBATIM
        for v in xs:
            w.write(v, eff)
        return
    order = 2  # second-difference predictor, as FIXED or as explicit LPC
    if as_lpc:
        _header(32 + order - 1)  # LPC, order 2
    else:
        _header(8 + order)  # FIXED, order 2
    for v in xs[:order]:
        w.write(v, eff)
    if as_lpc:
        w.write(5 - 1, 4)  # 5-bit coefficient precision
        w.write(0, 5)  # shift 0
        w.write(2, 5)  # coef[0] = 2
        w.write(-1, 5)  # coef[1] = -1
    res = [xs[n] - 2 * xs[n - 1] + xs[n - 2] for n in range(order, len(xs))]
    param = _rice_param(res)
    w.write(0, 2)  # 4-bit Rice method
    w.write(0, 4)  # partition order 0 (single partition)
    w.write(param, 4)
    for r in res:
        u = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        w.write_unary(u >> param)
        w.write(u, param)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    bps: int = 16,
    block_size: int = 1024,
    mid_side: bool = False,
    force_verbatim: bool = False,
    as_lpc: bool = False,
    use_wasted: bool = False,
) -> bytes:
    """float samples in [-1, 1] shaped (n,) or (n, ch) -> FLAC bytes.

    Fixture-grade but spec-conformant: fixed 4096/`block_size` blocking,
    CONSTANT / VERBATIM / FIXED-2 + Rice subframes (`as_lpc` emits the
    same predictor through the explicit-LPC subframe type; `use_wasted`
    signals shared trailing zero bits via the wasted-bits field), optional
    mid/side for stereo, real CRC-8/CRC-16 and STREAMINFO MD5 (so decoders
    that check integrity — including ours — exercise those paths)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if mid_side and ch != 2:
        raise ValueError("mid_side needs exactly 2 channels")
    lim = 1 << (bps - 1)
    q = np.clip(np.round(x * (lim - 1)), -lim, lim - 1).astype(np.int64)

    width = (bps + 7) // 8
    md5 = hashlib.md5(q.astype({1: "<i1", 2: "<i2", 4: "<i4"}[width]).tobytes())

    out = bytearray(_MAGIC)
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    fields = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    info += fields.to_bytes(8, "big")
    info += md5.digest()
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)

    for fi, start in enumerate(range(0, n, block_size)):
        blk = q[start : start + block_size]
        bs = blk.shape[0]
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(rate, 0)
        ch_code = 10 if mid_side else ch - 1
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        hdr = bytearray()
        hdr += struct.pack(">H", 0xFFF8)  # sync + fixed blocking
        hdr.append((7 << 4) | sr_code)  # 16-bit explicit blocksize field
        hdr.append((ch_code << 4) | (ss_code << 1))
        hdr += _coded_number(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(crc8(bytes(hdr)))

        w = _BitWriter()
        if mid_side:
            left, right = blk[:, 0], blk[:, 1]
            mid, side = (left + right) >> 1, left - right
            _write_subframe(w, mid, bps, force_verbatim, as_lpc, use_wasted)
            _write_subframe(w, side, bps + 1, force_verbatim, as_lpc, use_wasted)
        else:
            for c in range(ch):
                _write_subframe(w, blk[:, c], bps, force_verbatim, as_lpc, use_wasted)
        w.align()
        frame = bytes(hdr) + w.bytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)
