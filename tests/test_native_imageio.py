"""Native C++ image-IO runtime: build, load via ctypes, and verify bit-parity
with the Python writers."""

import os
import subprocess

import numpy as np
import pytest

import raytracingweekend_jl_tpu.utils.image as im

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def native_lib():
    rc = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True, text=True)
    if rc.returncode != 0:
        pytest.skip(f"native build unavailable: {rc.stderr[-300:]}")
    # Reset the loader cache so the fresh build is picked up.
    im._NATIVE_TRIED = False
    im._NATIVE = None
    lib = im._native_lib()
    if lib is None:
        pytest.skip("libimageio.so did not load")
    return lib


def test_native_png_matches_python(native_lib, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    p_native = str(tmp_path / "native.png")
    assert im._native_write("rtw_write_png", img, p_native, False)
    back = im.read_png(p_native)
    np.testing.assert_array_equal(im.to_uint8(back), im.to_uint8(img))


def test_native_png_gamma2(native_lib, tmp_path):
    rng = np.random.default_rng(1)
    linear = rng.uniform(0, 1.2, (16, 16, 3)).astype(np.float32)  # incl. >1
    p = str(tmp_path / "g.png")
    assert im._native_write("rtw_write_png", linear, p, True)
    back = im.read_png(p)
    expect = im.to_uint8(np.clip(np.sqrt(np.clip(linear, 0, None)), 0, 1))
    np.testing.assert_array_equal(im.to_uint8(back), expect)


def test_native_ppm(native_lib, tmp_path):
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (8, 10, 3)).astype(np.float32)
    p = str(tmp_path / "x.ppm")
    assert im._native_write("rtw_write_ppm", img, p, False)
    data = open(p, "rb").read()
    assert data.startswith(b"P6\n10 8\n255\n")
    pix = np.frombuffer(data.split(b"255\n", 1)[1], np.uint8).reshape(8, 10, 3)
    np.testing.assert_array_equal(pix, im.to_uint8(img))


def test_write_png_uses_native_when_built(native_lib, tmp_path):
    img = np.full((4, 4, 3), 0.25, np.float32)
    p = str(tmp_path / "via_api.png")
    im.write_png(img, p)
    assert os.path.exists(p)
    np.testing.assert_array_equal(im.to_uint8(im.read_png(p)), im.to_uint8(img))
