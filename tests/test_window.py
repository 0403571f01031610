import numpy as np

from sigdigger_tpu.dsp.window import window_energy, window_taps
from sigdigger_tpu.types import WindowFunction


def test_shapes_and_range():
    for kind in WindowFunction:
        w = window_taps(kind, 1024)
        assert w.shape == (1024,)
        assert w.dtype == np.float32
        assert np.all(w <= 1.0 + 1e-6)


def test_none_is_ones():
    assert np.allclose(window_taps(WindowFunction.NONE, 64), 1.0)


def test_hann_periodic():
    w = window_taps(WindowFunction.HANN, 8)
    # periodic hann: w[0] = 0, symmetric around n/2
    assert w[0] == 0.0
    assert np.allclose(w[1:], w[1:][::-1], atol=1e-6)


def test_blackmann_harris_sidelobes():
    """BH window must deliver deep sidelobes (> 85 dB) in a zero-padded DFT."""
    n = 256
    w = window_taps(WindowFunction.BLACKMANN_HARRIS, n).astype(np.float64)
    spec = np.abs(np.fft.fft(w, 8192))
    spec /= spec[0]
    db = 20 * np.log10(spec + 1e-300)
    # skip mainlobe (~±4 bins → 4*32 padded bins)
    sidelobes = db[160: 8192 - 160]
    assert sidelobes.max() < -85.0


def test_window_energy_matches():
    for kind in WindowFunction:
        w = window_taps(kind, 512).astype(np.float64)
        assert np.isclose(window_energy(kind, 512), np.sum(w**2), rtol=1e-6)
