"""Compiled-shim bridge to the system libjpeg — the reference binary the
arithmetic-coded JPEG decoder (dedup/jpeg_arith.py) is verified against,
exactly as the VP8 decoder is verified against libwebp
(tests/libwebp_oracle.py) and the Huffman JPEG paths against JVM ImageIO.

The system ships libjpeg-turbo's libjpeg.so.62 with the arithmetic
entropy coders compiled in (`jinit_arith_{en,de}coder` are exported), but
no cjpeg/djpeg binaries — so this module compiles a ~100-line C shim at
test time (gcc + jpeglib.h are present in this container) and caches the
binary in /tmp keyed by the source hash. Everything degrades to a clean
pytest skip when the compiler, header, or library is missing.

Shim surface:
  enc: PPM/PGM -> JPEG with arithmetic/progressive/restart/subsampling
       switches (drives jpeg_simple_progression, arith_code, etc.)
  dec: any JPEG -> PPM (always RGB out) — the pixel oracle.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SHIM_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_pnm(const char *path, int *w, int *h, int *ch) {
    FILE *f = fopen(path, "rb");
    char magic[3] = {0};
    int maxv, c;
    if (!f) return NULL;
    if (fscanf(f, "%2s", magic) != 1) return NULL;
    *ch = strcmp(magic, "P6") == 0 ? 3 : 1;
    /* skip whitespace/comments between header fields */
    int vals[3], got = 0;
    while (got < 3) {
        c = fgetc(f);
        if (c == '#') { while ((c = fgetc(f)) != '\n' && c != EOF) {} }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {}
        else { ungetc(c, f); if (fscanf(f, "%d", &vals[got]) != 1) return NULL; got++; }
    }
    *w = vals[0]; *h = vals[1]; maxv = vals[2];
    (void)maxv;
    fgetc(f); /* single whitespace before raster */
    size_t n = (size_t)(*w) * (*h) * (*ch);
    unsigned char *buf = malloc(n);
    if (fread(buf, 1, n, f) != n) { free(buf); return NULL; }
    fclose(f);
    return buf;
}

static int do_enc(int argc, char **argv) {
    /* enc in.pnm out.jpg quality arith progressive restart h2v2
       [dc_L dc_U ac_Kx]  — optional nondefault DAC conditioning */
    int w, h, ch;
    unsigned char *pix = read_pnm(argv[2], &w, &h, &ch);
    if (!pix) return 2;
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    FILE *out = fopen(argv[3], "wb");
    jpeg_stdio_dest(&c, out);
    c.image_width = w; c.image_height = h;
    c.input_components = ch;
    c.in_color_space = ch == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, atoi(argv[4]), TRUE);
    c.arith_code = atoi(argv[5]) ? TRUE : FALSE;
    if (atoi(argv[6])) jpeg_simple_progression(&c);
    c.restart_interval = atoi(argv[7]);
    if (ch == 3 && atoi(argv[8])) {        /* 4:2:0 */
        c.comp_info[0].h_samp_factor = 2; c.comp_info[0].v_samp_factor = 2;
        c.comp_info[1].h_samp_factor = 1; c.comp_info[1].v_samp_factor = 1;
        c.comp_info[2].h_samp_factor = 1; c.comp_info[2].v_samp_factor = 1;
    } else if (ch == 3) {                  /* 4:4:4 */
        for (int i = 0; i < 3; i++) {
            c.comp_info[i].h_samp_factor = 1; c.comp_info[i].v_samp_factor = 1;
        }
    }
    if (argc >= 12) {                      /* nondefault DAC conditioning */
        for (int i = 0; i < NUM_ARITH_TBLS; i++) {
            c.arith_dc_L[i] = (UINT8)atoi(argv[9]);
            c.arith_dc_U[i] = (UINT8)atoi(argv[10]);
            c.arith_ac_K[i] = (UINT8)atoi(argv[11]);
        }
    }
    jpeg_start_compress(&c, TRUE);
    JSAMPROW row;
    while (c.next_scanline < c.image_height) {
        row = pix + (size_t)c.next_scanline * w * ch;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    fclose(out);
    jpeg_destroy_compress(&c);
    free(pix);
    return 0;
}

static int do_dec(int argc, char **argv) {
    /* dec in.jpg out.ppm */
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr err;
    d.err = jpeg_std_error(&err);
    jpeg_create_decompress(&d);
    FILE *in = fopen(argv[2], "rb");
    if (!in) return 2;
    jpeg_stdio_src(&d, in);
    jpeg_read_header(&d, TRUE);
    d.out_color_space = JCS_RGB;
    jpeg_start_decompress(&d);
    FILE *out = fopen(argv[3], "wb");
    fprintf(out, "P6\n%d %d\n255\n", d.output_width, d.output_height);
    unsigned char *row = malloc((size_t)d.output_width * 3);
    JSAMPROW rp = row;
    while (d.output_scanline < d.output_height) {
        jpeg_read_scanlines(&d, &rp, 1);
        fwrite(row, 1, (size_t)d.output_width * 3, out);
    }
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    fclose(in); fclose(out); free(row);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 9 && strcmp(argv[1], "enc") == 0) return do_enc(argc, argv);
    if (argc >= 4 && strcmp(argv[1], "dec") == 0) return do_dec(argc, argv);
    fprintf(stderr, "usage: shim enc in.pnm out.jpg q arith prog rst h2v2 | "
                    "shim dec in.jpg out.ppm\n");
    return 1;
}
"""

_shim_path: str | None = None
_probed = False


def shim() -> str | None:
    """Compile (once) and return the shim binary path, or None if the
    toolchain/library is unavailable (callers skip)."""
    global _shim_path, _probed
    if _probed:
        return _shim_path
    _probed = True
    tag = hashlib.sha256(_SHIM_C.encode()).hexdigest()[:16]
    exe = os.path.join(tempfile.gettempdir(), f"jpeg_shim_{tag}")
    if not os.path.exists(exe):
        src = exe + ".c"
        with open(src, "w") as f:
            f.write(_SHIM_C)
        try:
            subprocess.run(
                ["gcc", "-O2", "-o", exe, src, "-ljpeg"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    _shim_path = exe
    return exe


def _write_pnm(path: str, arr: np.ndarray) -> None:
    if arr.ndim == 2:
        hdr = f"P5\n{arr.shape[1]} {arr.shape[0]}\n255\n"
    else:
        hdr = f"P6\n{arr.shape[1]} {arr.shape[0]}\n255\n"
    with open(path, "wb") as f:
        f.write(hdr.encode())
        f.write(np.ascontiguousarray(arr, dtype=np.uint8).tobytes())


def encode(
    pixels: np.ndarray,
    quality: int = 90,
    arith: bool = True,
    progressive: bool = False,
    restart: int = 0,
    h2v2: bool = False,
    conditioning: tuple[int, int, int] | None = None,
) -> bytes:
    exe = shim()
    assert exe is not None
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.pnm")
        dst = os.path.join(td, "out.jpg")
        _write_pnm(src, pixels)
        cond = [str(v) for v in conditioning] if conditioning else []
        subprocess.run(
            [
                exe, "enc", src, dst, str(quality), str(int(arith)),
                str(int(progressive)), str(restart), str(int(h2v2)), *cond,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        with open(dst, "rb") as f:
            return f.read()


def decode(data: bytes) -> np.ndarray:
    """Reference decode to HxWx3 uint8 RGB via libjpeg itself."""
    exe = shim()
    assert exe is not None
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.jpg")
        dst = os.path.join(td, "out.ppm")
        with open(src, "wb") as f:
            f.write(data)
        subprocess.run(
            [exe, "dec", src, dst], check=True, capture_output=True, timeout=120
        )
        with open(dst, "rb") as f:
            magic = f.readline()
            assert magic.strip() == b"P6"
            dims = f.readline().split()
            w, h = int(dims[0]), int(dims[1])
            f.readline()  # maxval
            return np.frombuffer(f.read(), dtype=np.uint8).reshape(h, w, 3)
