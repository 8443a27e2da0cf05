"""Regenerate dedup/vp8_tables.py's large constant tables from the
container's libwebp shared library.

The VP8 bitstream format (RFC 6386) fixes five large constant tables that
every conforming codec carries verbatim:

  - dc_qlookup[128]   / ac_qlookup[128]    (quantizer lookup, §14.1)
  - coeff_update_probs[4][8][3][11]        (token prob update flags, §13.4)
  - default_coeff_probs[4][8][3][11]       (initial token probs, §13.5)
  - kf_ymode/bmode/uv tables; kf_bmode_prob[10][10][9] (§11.2-11.5)

This sandbox has no network to fetch RFC 6386's text, but the system
libwebp (BSD-licensed, /usr/lib/x86_64-linux-gnu/libwebp.so.7) compiles
those spec constants into its .rodata. This script locates them
STRUCTURALLY — probability tables are the only long zero-free byte runs
in .rodata; the quantizer tables are the only long monotone ramps — and
cross-checks each against independently-known spec anchors (value ranges,
the 4..157 / 4..284 quantizer endpoints, the all-128 unused band-0 rows,
the 85%-saturated update table). The decoder's bit-exact YUV equality
against libwebp's own decode over hundreds of encoder-generated files
(tests/test_vp8.py) then verifies every byte that can matter end to end.

Usage: python tools/extract_vp8_tables.py [libwebp.so path]
Prints the five tables as Python literals (paste into dedup/vp8_tables.py).
"""

from __future__ import annotations

import struct
import sys

DEFAULT_SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"


def _rodata(path: str) -> tuple[bytes, int]:
    """Return (.rodata bytes, file offset) by parsing the ELF section
    headers (no objdump dependency)."""
    data = open(path, "rb").read()
    assert data[:4] == b"\x7fELF" and data[4] == 2, "need ELF64"
    e_shoff = struct.unpack_from("<Q", data, 0x28)[0]
    e_shentsize, e_shnum, e_shstrndx = struct.unpack_from("<HHH", data, 0x3A)
    shs = [
        struct.unpack_from("<IIQQQQIIQQ", data, e_shoff + i * e_shentsize)
        for i in range(e_shnum)
    ]
    strtab_off = shs[e_shstrndx][4]
    for name_off, _t, _f, _addr, off, size, *_ in shs:
        name = data[strtab_off + name_off : data.index(b"\0", strtab_off + name_off)]
        if name == b".rodata":
            return data[off : off + size], off
    raise RuntimeError("no .rodata section")


def _zero_free_runs(ro: bytes, min_len: int) -> list[tuple[int, int]]:
    runs, start = [], None
    for i, b in enumerate(ro):
        if b != 0:
            if start is None:
                start = i
        else:
            if start is not None and i - start >= min_len:
                runs.append((start, i - start))
            start = None
    if start is not None and len(ro) - start >= min_len:
        runs.append((start, len(ro) - start))
    return runs


def extract(path: str = DEFAULT_SO) -> dict[str, object]:
    ro, _ = _rodata(path)

    # quantizer tables: ac is the unique monotone uint16[128] ramp 4..284;
    # dc is the unique monotone uint8[128] ramp 4..157 (fits a byte)
    ac = dc = None
    for off in range(0, len(ro) - 256, 2):
        v = struct.unpack_from("<128H", ro, off)
        if v[0] == 4 and v[-1] == 284 and all(a <= b for a, b in zip(v, v[1:])):
            assert ac is None or ac == list(v)
            ac = list(v)
    for off in range(len(ro) - 128):
        v = list(ro[off : off + 128])
        if (
            v[0] == 4
            and v[-1] == 157
            and v[6] == 10
            and all(a <= b for a, b in zip(v, v[1:]))
            and len(set(v)) > 100
        ):
            assert dc is None or dc == v
            dc = v
    assert ac and dc, "quantizer ramps not found"

    # probability tables: zero-free runs. 1956 = 1056 (update probs,
    # ~85% saturated at 255) + 900 (kf_bmode_prob, almost no 255s);
    # 1056 starting with the 33 x 128 unused band-0 block = default probs.
    cand_big, cand_def = set(), set()
    for s, ln in _zero_free_runs(ro, 900):
        seg = ro[s : s + ln]
        if ln == 1956 and seg[:33] == b"\xff" * 33:
            upd, bm = seg[:1056], seg[1056:]
            if upd.count(255) / 1056 > 0.7 and bm.count(255) / 900 < 0.1:
                cand_big.add((upd, bm))
        if ln in (1056, 1068) and seg[:33] == b"\x80" * 33:
            cand_def.add(seg[:1056])
    assert len(cand_big) == 1, f"update/kf_bmode blob: {len(cand_big)} candidates"
    assert len(cand_def) == 1, f"default probs: {len(cand_def)} candidates"
    (upd, bm) = next(iter(cand_big))
    dflt = next(iter(cand_def))

    def quad(b: bytes) -> list:  # [4][8][3][11]
        it = iter(b)
        return [
            [[[next(it) for _ in range(11)] for _ in range(3)] for _ in range(8)]
            for _ in range(4)
        ]

    # libwebp's intra-bmode enum orders RD,VR BEFORE LD (0..9 = DC,TM,VE,
    # HE,RD,VR,LD,VL,HD,HU) while RFC 6386 §11.3 orders LD first (DC,TM,
    # VE,HE,LD,RD,VR,VL,HD,HU). The blob is indexed by libwebp's numbering
    # on BOTH axes; permute it into the RFC's numbering (the per-row nine
    # probabilities are positional tree-node probs — identical tree shape
    # in both — so only the two mode axes need the remap). Found the hard
    # way: one mismatched subblock whose neighbor context was (LD, VL).
    perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # RFC index -> libwebp index
    kf_bmode = [
        [
            [bm[(perm[i] * 10 + perm[j]) * 9 + k] for k in range(9)]
            for j in range(10)
        ]
        for i in range(10)
    ]
    return {
        "DC_QLOOKUP": dc,
        "AC_QLOOKUP": ac,
        "COEF_UPDATE_PROBS": quad(upd),
        "DEFAULT_COEF_PROBS": quad(dflt),
        "KF_BMODE_PROB": kf_bmode,
    }


def main() -> None:
    tables = extract(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SO)
    for name, val in tables.items():
        print(f"{name} = {val!r}\n")


if __name__ == "__main__":
    main()
