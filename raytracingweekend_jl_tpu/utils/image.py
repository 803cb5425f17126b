"""Image output utilities.

The reference renders into a ``Matrix{RGB}`` and lists "save image, e.g. PNG"
as future work (reference: README.md:170, src/render.jl:15); here PNG/PPM
writing is a first-class utility. Arrays are ``[H,W,3]`` floats in [0,1], row 0
at the image top (the driver already applies the reference's Y-flip and gamma).
"""

from __future__ import annotations

import numpy as np


def to_uint8(img) -> np.ndarray:
    """[H,W,3] float [0,1] -> uint8 with round-half-away like image viewers."""
    arr = np.asarray(img, dtype=np.float64)
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)


def write_png(img, path: str) -> None:
    """Write a PNG (via PIL when present, else pure-Python fallback)."""
    arr = to_uint8(img)
    try:
        from PIL import Image
        Image.fromarray(arr, mode="RGB").save(path)
    except ImportError:
        _write_png_pure(arr, path)


def write_ppm(img, path: str) -> None:
    """Binary PPM (P6) writer — dependency-free lowest common denominator."""
    arr = to_uint8(img)
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
