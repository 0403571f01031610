"""Headless SymView / Waveform components (reference SymViewTab +
Waveform/TimeWindow rendering)."""

from __future__ import annotations

import numpy as np

from sigdigger_tpu.utils.symview import SymView
from sigdigger_tpu.utils.waveform import WaveformView, column_envelope


# -- SymView -----------------------------------------------------------------

def test_symview_raster_and_scaling():
    sv = SymView(bits_per_symbol=2)
    sv.feed(np.tile([0, 1, 2, 3], 64))
    sv.width = 4
    img = sv.to_rgb()
    assert img.shape == (64, 4, 3)
    # symbol id scaled across the full grayscale range
    assert img[0, 0, 0] == 0 and img[0, 3, 0] == 255
    assert img[0, 1, 0] == 255 // 3


def test_symview_offset_and_rows_cap():
    sv = SymView(bits_per_symbol=1)
    sv.feed(np.arange(100) % 2)
    sv.width = 10
    sv.offset = 5
    img = sv.to_rgb(max_rows=3)
    assert img.shape == (3, 10, 3)
    assert img[0, 0, 0] == 255          # symbol index 5 → value 1


def test_symview_autofit_finds_frame_length():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 2, 37)
    stream = np.tile(frame, 80)
    sv = SymView(bits_per_symbol=1)
    sv.feed(stream)
    assert sv.autofit() == 37


def test_symview_text_and_bits(tmp_path):
    sv = SymView(bits_per_symbol=2)
    sv.feed([0, 1, 2, 3, 3, 2, 1, 0])
    sv.width = 4
    p = tmp_path / "syms.txt"
    sv.save_text(str(p))
    assert p.read_text() == "0123\n3210\n"
    bits = sv.to_bits()
    np.testing.assert_array_equal(
        bits[:8], [0, 0, 0, 1, 1, 0, 1, 1])


def test_symview_png_roundtrip(tmp_path):
    sv = SymView(bits_per_symbol=1)
    sv.feed(np.arange(256) % 2)
    sv.width = 16
    p = tmp_path / "sym.png"
    sv.save_png(str(p))
    assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


# -- WaveformView -------------------------------------------------------------

def test_column_envelope():
    tr = np.array([0.0, 1.0, -1.0, 0.5, 2.0, -2.0, 0.0, 0.0])
    mins, maxs = column_envelope(tr, 4)
    np.testing.assert_allclose(mins, [0.0, -1.0, -2.0, 0.0])
    np.testing.assert_allclose(maxs, [1.0, 0.5, 2.0, 0.0])


def test_waveform_views_render():
    n = 4096
    t = np.arange(n)
    iq = (np.exp(2j * np.pi * 0.01 * t) *
          (1.0 + 0.5 * np.sin(2 * np.pi * 0.001 * t))
          ).astype(np.complex64)
    wf = WaveformView()
    wf.feed(iq)
    for view in ("real", "imag", "abs", "phase", "freq"):
        img = wf.render(view=view, width=256, height=64)
        assert img.shape == (64, 256, 3)
        assert (img == 255).any(), view     # trace drawn
    # abs view: AM envelope spans a band, not a flat line
    img = wf.render(view="abs", width=256, height=64)
    cols = (img[:, :, 0] == 255).sum(axis=0)
    assert cols.max() > 3


def test_waveform_freq_view_tracks_fm():
    """Instantaneous-frequency view of an FM step lands in two bands."""
    n = 8192
    f = np.concatenate([np.full(n // 2, 0.05), np.full(n // 2, 0.20)])
    phase = 2 * np.pi * np.cumsum(f)
    wf = WaveformView()
    wf.feed(np.exp(1j * phase).astype(np.complex64))
    img = wf.render(view="freq", width=128, height=100)
    ys = [np.flatnonzero(img[:, c, 0] == 255).mean()
          for c in (10, 120)]
    assert ys[0] > ys[1] + 20       # higher freq → higher on screen


def test_waveform_history_bounded():
    wf = WaveformView(max_samples=1000)
    for _ in range(5):
        wf.feed(np.zeros(400, np.complex64))
    assert len(wf) == 1000
