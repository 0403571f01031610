import numpy as np

from sigdigger_tpu.dsp.spectrum import SpectrumEstimator, psd_frequencies
from sigdigger_tpu.types import WindowFunction


def make_tone(n, f, fs, amp=1.0, phase0=0.0):
    k = np.arange(n, dtype=np.float64)
    return (amp * np.exp(1j * (2 * np.pi * f * k / fs + phase0))).astype(
        np.complex64
    )


def test_tone_peak_location_and_power():
    fs = 1_000_000.0
    w = 1024
    est = SpectrumEstimator(w, fs, WindowFunction.HANN, alpha=0.5)
    f0 = 125_000.0  # exactly bin 128
    x = make_tone(w * 16, f0, fs)
    psd = np.asarray(est.feed(x))
    peak = np.argmax(psd)
    assert peak == int(f0 / fs * w)
    freqs = psd_frequencies(w, fs)
    shifted = est.shifted()
    assert np.isclose(freqs[np.argmax(shifted)], f0)


def test_white_noise_psd_level(rng):
    """PSD of complex white noise must equal N0 = sigma^2 / fs per bin."""
    fs = 48000.0
    w = 512
    est = SpectrumEstimator(w, fs, WindowFunction.HANN, alpha=0.02)
    sigma2 = 2.0
    n = w * 256
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    ) * np.sqrt(sigma2 / 2)
    psd = np.asarray(est.feed(x))
    expected = sigma2 / fs
    assert np.isclose(psd.mean(), expected, rtol=0.1)


def test_ema_fold_matches_sequential():
    """The closed-form block EMA must match per-frame sequential EMA."""
    fs = 1e6
    w = 256
    alpha = 0.25
    est = SpectrumEstimator(w, fs, WindowFunction.NONE, alpha=alpha)
    rng = np.random.default_rng(7)
    frames = 12
    x = (rng.standard_normal(w * frames) + 1j * rng.standard_normal(w * frames)
         ).astype(np.complex64)
    psd = np.asarray(est.feed(x))

    # sequential reference
    ref = None
    scale = 1.0 / (fs * w)
    for i in range(frames):
        frame = x[i * w:(i + 1) * w].astype(np.complex128)
        p = np.abs(np.fft.fft(frame)) ** 2 * scale
        ref = p if ref is None else ref + alpha * (p - ref)
    assert np.allclose(psd, ref, rtol=1e-4)


def test_multiblock_continuity():
    fs = 1e6
    w = 256
    est = SpectrumEstimator(w, fs, WindowFunction.HAMMING, alpha=0.1)
    x = make_tone(w * 8, 31250.0, fs)
    est.feed(x[: w * 4])
    psd = np.asarray(est.feed(x[w * 4:]))
    assert np.argmax(psd) == int(31250.0 / fs * w)
    assert est.state.count == 8
