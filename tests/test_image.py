"""Image I/O tests: gamma transfer values, PPM byte format, PNG validity
(``src/utils.cpp:11-16``, ``src/main.cpp:240-247``)."""

import struct
import zlib

import numpy as np

from cpu_path_tracing_tpu.utils.image import color_to_int, read_ppm, tonemap, write_png, write_ppm


def test_color_to_int_reference_values():
    # round(clamp(x)^(1/2.2)*255)
    assert color_to_int(np.array(0.0)) == 0
    assert color_to_int(np.array(1.0)) == 255
    assert color_to_int(np.array(2.0)) == 255  # clamps first
    assert color_to_int(np.array(-1.0)) == 0
    x = 0.5
    assert color_to_int(np.array(x)) == int(round((x ** (1 / 2.2)) * 255.0))


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((6, 8, 3))
    p = tmp_path / "t.ppm"
    write_ppm(str(p), img)
    back = read_ppm(str(p))
    np.testing.assert_array_equal(back, tonemap(img))
    header = p.read_text().split("\n")[:3]
    assert header == ["P3", "8 6", "255"]


def test_png_is_decodable(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((5, 7, 3))
    p = tmp_path / "t.png"
    write_png(str(p), img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # parse IHDR
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (7, 5)
    # find IDAT, decompress, strip filter bytes, compare to tonemap
    i = data.index(b"IDAT")
    ln = struct.unpack(">I", data[i - 4 : i])[0]
    raw = zlib.decompress(data[i + 4 : i + 4 + ln])
    rows = np.frombuffer(raw, np.uint8).reshape(5, 1 + 7 * 3)
    assert (rows[:, 0] == 0).all()
    np.testing.assert_array_equal(rows[:, 1:].reshape(5, 7, 3), tonemap(img))
