"""ctypes bridge to the system libwebp — the reference binary the VP8
decoder (dedup/vp8.py) is verified against, exactly as the JPEG decoder
is verified against JVM ImageIO.

Two surfaces:
  - simple API (WebPEncodeRGB / WebPDecodeYUV): always available when the
    shared library exists; drives the main bit-exact corpus.
  - advanced API (WebPConfig/WebPPicture/WebPEncode): used to force the
    encoder paths the simple API never emits (simple loop filter,
    sharpness > 0, multiple token partitions, forced segment counts).
    Struct layouts match libwebp 1.2.x; `advanced_available()` probes the
    ABI version at import and the tests skip the extended corpus cleanly
    on mismatch rather than guessing at offsets.
"""

from __future__ import annotations

import ctypes
import struct as _struct

import numpy as np

_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
    "libwebp.so.7",
    "libwebp.so",
]


def load() -> ctypes.CDLL | None:
    for p in _PATHS:
        try:
            lib = ctypes.CDLL(p)
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            return lib
        except OSError:
            continue
    return None


def encode_rgb(lib: ctypes.CDLL, rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        rgb.tobytes(), w, h, w * 3, ctypes.c_float(quality), ctypes.byref(out)
    )
    assert n > 0, "libwebp encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_yuv(lib: ctypes.CDLL, data: bytes):
    """Reference decode to the spec-determined YUV 4:2:0 surface."""
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    py = lib.WebPDecodeYUV(
        data, ctypes.c_size_t(len(data)), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v), ctypes.byref(stride),
        ctypes.byref(uv_stride),
    )
    assert py, "libwebp decode failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.ctypeslib.as_array(py, (H, S))[:, :W].copy()
    U = np.ctypeslib.as_array(u, (ch, US))[:, :cw].copy()
    V = np.ctypeslib.as_array(v, (ch, US))[:, :cw].copy()
    lib.WebPFree(py)
    return Y, U, V


def vp8_payload(data: bytes) -> bytes:
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP", "not WebP"
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = _struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"VP8 ":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


# ------------------------------------------------- advanced API (1.2.x)

_ABI_CANDIDATES = (0x020F, 0x020E, 0x0210, 0x0211)


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [
        ("mem", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_size_t),
        ("max_size", ctypes.c_size_t),
        ("pad", ctypes.c_uint32 * 1),
    ]


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int),
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p),
        ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


def _abi(lib: ctypes.CDLL) -> int | None:
    for v in _ABI_CANDIDATES:
        cfg = WebPConfig()
        if lib.WebPConfigInitInternal(
            ctypes.byref(cfg), 0, ctypes.c_float(75.0), v
        ):
            return v
    return None


def advanced_available(lib: ctypes.CDLL) -> bool:
    return _abi(lib) is not None


def encode_advanced(
    lib: ctypes.CDLL,
    rgb: np.ndarray,
    quality: float = 75.0,
    *,
    filter_type: int = 0,
    filter_strength: int = 60,
    filter_sharpness: int = 0,
    partitions: int = 0,
    segments: int = 4,
    method: int = 4,
) -> bytes:
    """Encode through WebPConfig/WebPPicture to force specific stream
    features. Raises RuntimeError when the ABI probe fails."""
    abi = _abi(lib)
    if abi is None:
        raise RuntimeError("libwebp advanced ABI not recognized")
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(
        ctypes.byref(cfg), 0, ctypes.c_float(quality), abi
    )
    cfg.filter_type = filter_type
    cfg.filter_strength = filter_strength
    cfg.filter_sharpness = filter_sharpness
    cfg.partitions = partitions
    cfg.segments = segments
    cfg.method = method
    cfg.autofilter = 0
    assert lib.WebPValidateConfig(ctypes.byref(cfg))

    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), abi)
    h, w, _ = rgb.shape
    pic.width, pic.height = w, h
    pic.use_argb = 0
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), rgb.tobytes(), w * 3)

    wr = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    try:
        if not ok:
            raise RuntimeError(f"WebPEncode failed (error {pic.error_code})")
        return ctypes.string_at(wr.mem, wr.size)
    finally:
        lib.WebPMemoryWriterClear(ctypes.byref(wr))
        lib.WebPPictureFree(ctypes.byref(pic))
