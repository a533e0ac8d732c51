"""Native C++ I/O runtime (native/src/ptio.cpp) vs the Python oracle.

Byte-for-byte parity is required: same gamma transfer (round-half-even),
same PPM text format, same PNG stream (zlib level 6, filter 0).
"""

import os
import numpy as np
import pytest

from cpu_path_tracing_tpu.utils import native
from cpu_path_tracing_tpu.utils.image import read_ppm, tonemap

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _img(seed=0, shape=(13, 17, 3)):
    return np.random.default_rng(seed).random(shape).astype(np.float32) * 1.4 - 0.2


def test_tonemap_bytes_equal():
    img = _img()
    np.testing.assert_array_equal(native.tonemap_u8(img), tonemap(img))


def test_ppm_bytes_equal(tmp_path):
    img = _img(1)
    a, b = str(tmp_path / "n.ppm"), str(tmp_path / "p.ppm")
    assert native.write_ppm(a, img)
    import cpu_path_tracing_tpu.utils.image as im
    # force python path
    im.write_ppm(b, img.astype(np.float64))
    assert open(a, "rb").read() == open(b, "rb").read()
    np.testing.assert_array_equal(read_ppm(a), tonemap(img))


def test_png_decodes_identically(tmp_path):
    import struct, zlib

    img = _img(2)
    p = str(tmp_path / "n.png")
    assert native.write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (17, 13)
    i = data.index(b"IDAT")
    ln = struct.unpack(">I", data[i - 4 : i])[0]
    raw = zlib.decompress(data[i + 4 : i + 4 + ln])
    rows = np.frombuffer(raw, np.uint8).reshape(13, 1 + 17 * 3)
    assert (rows[:, 0] == 0).all()
    np.testing.assert_array_equal(rows[:, 1:].reshape(13, 17, 3), tonemap(img))


def test_gamma_boundary_values():
    img = np.array([[[0.0, 1.0, 2.0]], [[-1.0, 0.5, 0.2176]]], np.float32)
    np.testing.assert_array_equal(native.tonemap_u8(img), tonemap(img))


def test_async_writer_matches_sync(tmp_path):
    """Async native writes produce byte-identical files to the sync path and
    fall back cleanly when the native runtime is unavailable."""
    from cpu_path_tracing_tpu.utils.image import (
        flush_async_writes,
        write_png,
        write_png_async,
    )

    rng = np.random.default_rng(3)
    img = rng.random((20, 30, 3), dtype=np.float32)
    sync_path = str(tmp_path / "sync.png")
    async_path = str(tmp_path / "async.png")
    write_png(sync_path, img)
    write_png_async(async_path, img)
    flush_async_writes()
    assert open(async_path, "rb").read() == open(sync_path, "rb").read()


def test_async_writer_many_frames(tmp_path):
    from cpu_path_tracing_tpu.utils.image import flush_async_writes, write_png_async

    img = np.zeros((8, 8, 3), np.float32)
    paths = [str(tmp_path / f"f{i}.png") for i in range(16)]
    for i, p in enumerate(paths):
        write_png_async(p, img + i / 16.0)
    flush_async_writes()
    sizes = {os.path.getsize(p) for p in paths}
    assert all(os.path.exists(p) for p in paths) and min(sizes) > 0


def test_progressive_preview(tmp_path):
    """render_progressive writes partial previews at each flush."""
    import cpu_path_tracing_tpu as pt
    from cpu_path_tracing_tpu.utils.checkpoint import render_progressive

    cfg = pt.RenderConfig(width=8, height=6, spp=4, max_depth=6, integrator="batch")
    scene = pt.get_scene("box", 8, 6)
    preview = str(tmp_path / "preview.png")
    img = render_progressive(scene, cfg, flush_every=2, preview_path=preview)
    assert os.path.exists(preview)  # written at spp_done=2
    assert img.shape == (6, 8, 3)
