"""Pure-numpy lossless JPEG (SOF3) decoder + encoder (public spec
ITU-T.81 Annex H — predictive lossless, Huffman entropy coding).

Closes the lossless branch of the JPEG stub in dedup/jpeg.py: SOF3 files
(DNG tiles, medical imagery) carry no DCT at all — each sample is a
Huffman-coded difference from one of seven spatial predictors, computed
modulo 2^16 (H.1.2). The container has no codec library exporting a
lossless JPEG path (the system libjpeg.so.62 predates libjpeg-turbo 3's
lossless support), so conformance is evidenced the VP8L way: an
independent encoder (this module) plus hand-computed golden bitstreams in
tests/test_jpeg_lossless.py — the decoder is checked against hand math,
not just against its own inverse.

Scope: SOF3, 2-16 bit precision, predictors 1-7, point transform,
restart intervals, single interleaved scan over 1-4 components with
1x1 sampling (the only layout seen in practice for lossless).
Hierarchical (SOF5-7, SOF13-15) and arithmetic lossless (SOF11) remain
behind jpeg.py's guarded branch.
"""

from __future__ import annotations

import numpy as np

from dedup.jpeg import (
    _BitReader,
    _BitWriter,
    _build_huff,
    _entropy_segments,
    _extend,
    _hdecode,
    _huff_encode_table,
)


def _predict(
    row: list[int], prev: list[int], x: int, y: int, psel: int, default: int,
    line_start_y: int, line_start_x: int,
) -> int:
    """ITU-T.81 H.1.2.1 prediction for sample (x, y) of one component.

    `row`/`prev` hold reconstructed samples of the current and previous
    line. At the very start (of the scan or of a restart interval) the
    default 2^(P-Pt-1) is used; the remainder of that line predicts with
    Ra; later lines open with Rb and use the selected predictor elsewhere.
    """
    if y == line_start_y:
        if x == line_start_x:
            return default
        return row[x - 1]  # Ra for the rest of the opening line
    if x == 0:
        return prev[0]  # Rb at the start of every later line
    ra, rb, rc = row[x - 1], prev[x], prev[x - 1]
    if psel == 1:
        return ra
    if psel == 2:
        return rb
    if psel == 3:
        return rc
    if psel == 4:
        return ra + rb - rc
    if psel == 5:
        return ra + ((rb - rc) >> 1)
    if psel == 6:
        return rb + ((ra - rc) >> 1)
    if psel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {psel}")


def decode_lossless_jpeg(data: bytes) -> tuple[np.ndarray, int]:
    """SOF3 JPEG bytes -> ((H, W, C) uint16 samples, precision in bits).

    Output samples already include the decoder-side point-transform shift
    (Rx << Pt, H.2.2), so they sit on the nominal 0..2^P-1 scale.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    huff = {}
    frame = None
    restart = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xC3:  # SOF3: lossless sequential
            prec = seg[0]
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, _tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG with subsampled components"
                    )
                comps.append(cid)
            frame = {"h": h, "w": w, "prec": prec, "comps": comps}
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            raise ValueError("not a lossless (SOF3) JPEG")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                if tc == 0:
                    huff[th] = _build_huff(counts, seg[p + 17 : p + 17 + total])
                p += 17 + total
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF3")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"idx": frame["comps"].index(cs), "dc": tabs >> 4})
            psel = seg[1 + 2 * ns]  # Ss = predictor selector
            pt = seg[3 + 2 * ns] & 15  # Al = point transform
            if ns != len(frame["comps"]):
                raise NotImplementedError("multi-scan lossless JPEG")
            segs, _ = _entropy_segments(data, i)
            return _decode_scan(frame, scan, huff, psel, pt, restart, segs)
    raise ValueError("no SOS in lossless JPEG")


def _decode_scan(frame, scan, huff, psel, pt, restart, segs):
    H, W = frame["h"], frame["w"]
    nc = len(scan)
    prec = frame["prec"]
    default = 1 << (prec - pt - 1)
    out = np.zeros((H, W, nc), dtype=np.uint16)
    # per-component current/previous reconstructed lines
    rows = [[0] * W for _ in range(nc)]
    prevs = [[0] * W for _ in range(nc)]
    seg_iter = iter(segs)
    br = _BitReader(next(seg_iter))
    tabs = [huff[s["dc"]] for s in scan]
    # (line_start_y, line_start_x): where the current restart interval began
    ls_y, ls_x = 0, 0
    mcu = 0
    for y in range(H):
        for x in range(W):
            if restart and mcu and mcu % restart == 0:
                br = _BitReader(next(seg_iter))
                ls_y, ls_x = y, x
            for c in range(nc):
                s = _hdecode(br, tabs[c])
                if s == 16:
                    diff = 32768
                else:
                    diff = _extend(br.receive(s), s)
                pred = _predict(
                    rows[c], prevs[c], x, y, psel, default, ls_y, ls_x
                )
                rows[c][x] = (pred + diff) & 0xFFFF
            mcu += 1
        for c in range(nc):
            out[y, :, c] = rows[c]
            prevs[c], rows[c] = rows[c], prevs[c]
    if pt:
        out <<= pt
    return out, prec


# encoder ------------------------------------------------------------------

# one shared DC-class Huffman table covering every category 0..16: all 17
# symbols at code length 5 (Kraft: 17/32 < 1), canonical order
_ENC_COUNTS = [0, 0, 0, 0, 17] + [0] * 11
_ENC_SYMBOLS = bytes(range(17))


def encode_lossless_jpeg(
    samples: np.ndarray,
    precision: int = 8,
    predictor: int = 1,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, C) integer samples -> SOF3 JPEG bytes.

    Samples are divided by 2^point_transform before coding (H.1.1), so
    decode(encode(x)) == (x >> Pt) << Pt — exact when Pt == 0.
    """
    if samples.ndim == 2:
        samples = samples[:, :, None]
    H, W, nc = samples.shape
    if not 2 <= precision <= 16:
        raise ValueError("lossless JPEG precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    x = (samples.astype(np.int64) >> point_transform).tolist()
    default = 1 << (precision - point_transform - 1)
    enc = _huff_encode_table(_ENC_COUNTS, _ENC_SYMBOLS)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    sof = bytes([precision]) + H.to_bytes(2, "big") + W.to_bytes(2, "big")
    sof += bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    seg(0xC3, sof)
    seg(0xC4, bytes([0x00]) + bytes(_ENC_COUNTS) + _ENC_SYMBOLS)
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, point_transform])
    seg(0xDA, sos)

    bw = _BitWriter()
    rows = [[0] * W for _ in range(nc)]
    prevs = [[0] * W for _ in range(nc)]
    ls_y, ls_x = 0, 0
    mcu = 0
    rst = 0
    for y in range(H):
        for xx in range(W):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                out.extend(bw.out)
                out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                bw = _BitWriter()
                ls_y, ls_x = y, xx
            for c in range(nc):
                pred = _predict(
                    rows[c], prevs[c], xx, y, predictor, default, ls_y, ls_x
                )
                v = x[y][xx][c] & 0xFFFF
                rows[c][xx] = v
                d = (v - pred) & 0xFFFF
                if d >= 32768:
                    d -= 65536
                if d == -32768:
                    code, length = enc[16]
                    bw.write(code, length)  # SSSS=16: no extra bits (H.2)
                    continue
                s = int(d).bit_length() if d > 0 else int(-d).bit_length()
                code, length = enc[s]
                bw.write(code, length)
                if s:
                    bw.write(d if d > 0 else d + (1 << s) - 1, s)
            mcu += 1
        for c in range(nc):
            prevs[c], rows[c] = rows[c], prevs[c]
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
