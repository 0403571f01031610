"""Waterfall model + PNG encoder + CLI waterfall export."""

import struct
import zlib

import numpy as np

from sigdigger_tpu.utils.waterfall import Waterfall, write_png


def read_png_size(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def test_png_roundtrip(tmp_path):
    rgb = np.zeros((4, 8, 3), np.uint8)
    rgb[1, 2] = (255, 0, 0)
    path = str(tmp_path / "x.png")
    write_png(path, rgb)
    w, h = read_png_size(path)
    assert (w, h) == (8, 4)
    # decode IDAT and verify the pixel
    with open(path, "rb") as f:
        data = f.read()
    idat_off = data.find(b"IDAT") + 4
    idat_len = struct.unpack(">I", data[idat_off - 8:idat_off - 4])[0]
    raw = zlib.decompress(data[idat_off:idat_off + idat_len])
    row1 = raw[1 + 8 * 3 + 1: 1 + 8 * 3 + 1 + 8 * 3]
    assert row1[6:9] == b"\xff\x00\x00"


def test_waterfall_rows_and_rolloff(tmp_path):
    wf = Waterfall(bins=64, max_rows=10)
    for i in range(25):
        psd = np.full(64, 1e-9)
        psd[i % 64] = 1.0
        wf.feed(psd)
    assert wf.rows == 10
    img = wf.to_rgb()
    assert img.shape == (10, 64, 3)
    path = str(tmp_path / "wf.png")
    wf.save_png(path)
    assert read_png_size(path) == (64, 10)


def test_cli_waterfall(tmp_path, capsys):
    fs = 128_000
    n = 1 << 16
    k = np.arange(n)
    x = np.exp(2j * np.pi * 10_000.0 / fs * k).astype(np.complex64)
    cap = tmp_path / f"c_{fs}sps.cf32"
    x.tofile(cap)
    png = str(tmp_path / "wf.png")
    from sigdigger_tpu.cli import main
    assert main(["psd", str(cap), "--fft", "512",
                 "--waterfall", png]) == 0
    w, h = read_png_size(png)
    assert w == 512 and h > 10
