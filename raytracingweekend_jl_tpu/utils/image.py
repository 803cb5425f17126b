"""Image output utilities.

The reference renders into a ``Matrix{RGB}`` and lists "save image, e.g. PNG"
as future work (reference: README.md:170, src/render.jl:15); here PNG/PPM
writing is a first-class utility. Arrays are ``[H,W,3]`` floats in [0,1], row 0
at the image top (the driver already applies the reference's Y-flip and gamma).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    """Load the optional C++ IO runtime (native/libimageio.so, built with
    ``make -C native``) — gamma+quantize+deflate off the Python heap."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                            "libimageio.so")
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(os.path.abspath(path))
                for fn in (lib.rtw_write_png, lib.rtw_write_ppm):
                    fn.restype = ctypes.c_int
                    fn.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int]
                _NATIVE = lib
            except OSError:
                _NATIVE = None
    return _NATIVE


def _native_write(fn_name: str, img, path: str, gamma2: bool) -> bool:
    lib = _native_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(np.asarray(img), dtype=np.float32)
    h, w, c = arr.shape
    assert c == 3
    rc = getattr(lib, fn_name)(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, 1 if gamma2 else 0)
    return rc == 0


def to_uint8(img) -> np.ndarray:
    """[H,W,3] float [0,1] -> uint8, rounding ties-to-even (np.rint; the
    native writer's nearbyintf matches bit-for-bit)."""
    arr = np.asarray(img, dtype=np.float64)
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)


def write_png(img, path: str, gamma2: bool = False) -> None:
    """Write a PNG. Prefers the native C++ writer when built (``make -C
    native``), else PIL, else a pure-Python encoder. ``gamma2=True`` lets the
    writer apply the reference's sqrt encoding to *linear* input
    (src/vec.jl:22) during quantization."""
    if _native_write("rtw_write_png", img, path, gamma2):
        return
    arr = to_uint8(np.sqrt(np.clip(img, 0, None)) if gamma2 else img)
    try:
        from PIL import Image
        Image.fromarray(arr, mode="RGB").save(path)
    except ImportError:
        _write_png_pure(arr, path)


def write_ppm(img, path: str, gamma2: bool = False) -> None:
    """Binary PPM (P6) writer (native C++ when built, else Python)."""
    if _native_write("rtw_write_ppm", img, path, gamma2):
        return
    arr = to_uint8(np.sqrt(np.clip(img, 0, None)) if gamma2 else img)
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())


def _write_png_pure(arr: np.ndarray, path: str) -> None:
    """Minimal stdlib-only PNG encoder (8-bit RGB, zlib-deflated)."""
    import struct
    import zlib

    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def read_png(path: str) -> np.ndarray:
    """Read a PNG to float [H,W,3] in [0,1] (for golden-image comparisons
    against the reference's committed renders, e.g.
    img/scene_random_spheres_1920x1080.png)."""
    from PIL import Image
    arr = np.asarray(Image.open(path).convert("RGB"), dtype=np.float64)
    return arr / 255.0
