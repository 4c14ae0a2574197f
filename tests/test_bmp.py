"""BMP writer format tests (cpu/src/bmp_writer.c parity)."""

import struct

import numpy as np

from parallel_ray_tracer_tpu.utils.bmp import bmp_bytes, read_bmp, write_bmp


def test_header_layout():
    img = np.zeros((2, 3, 3), np.float32)
    data = bmp_bytes(img)
    assert data[:2] == b"BM"
    (size,) = struct.unpack_from("<I", data, 2)
    assert size == len(data) == 54 + 2 * 3 * 4
    (offset,) = struct.unpack_from("<I", data, 10)
    assert offset == 54
    w, h = struct.unpack_from("<ii", data, 18)
    assert (w, h) == (3, 2)
    (bpp,) = struct.unpack_from("<H", data, 28)
    assert bpp == 32


def test_bgra_bottom_up():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [1.0, 0.0, 0.0]  # top-left red
    img[1, 1] = [0.0, 0.0, 1.0]  # bottom-right blue
    data = bmp_bytes(img)
    px = data[54:]
    # First stored row is the BOTTOM image row: pixels (1,0), (1,1).
    assert px[0:4] == bytes([0, 0, 0, 255])
    assert px[4:8] == bytes([255, 0, 0, 255])  # blue -> B=255
    # Second stored row is the top: (0,0) red -> BGRA (0,0,255,255).
    assert px[8:12] == bytes([0, 0, 255, 255])


def test_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.random_sample((5, 7, 3)).astype(np.float32)
    p = str(tmp_path / "t.bmp")
    write_bmp(p, img)
    back = read_bmp(p)
    expect = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(back, expect)


def test_float_truncation_matches_c_cast():
    # C does (unsigned char)(f * 255) — truncation toward zero.
    img = np.full((1, 1, 3), 0.999, np.float32)
    data = bmp_bytes(img)
    assert data[54] == int(0.999 * 255)  # 254, not 255
