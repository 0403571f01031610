"""General IIR path (`su_iir_*` equivalent): design correctness vs
scipy's reference designer, streaming-equals-oneshot, and filtering
behavior on complex IQ."""

from __future__ import annotations

import numpy as np
import pytest

from sigdigger_tpu.dsp.iir import (
    IIRFilter,
    butterworth_sos,
    notch_sos,
    sos_response,
)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
@pytest.mark.parametrize("kind", ["lowpass", "highpass"])
def test_butterworth_matches_scipy(order, kind):
    from scipy.signal import butter, sosfreqz

    fs = 48_000.0
    fc = 4_000.0
    mine = butterworth_sos(order, fc, kind=kind, fs=fs)
    ref = butter(order, fc,
                 btype={"lowpass": "low", "highpass": "high"}[kind],
                 fs=fs, output="sos")
    w = np.linspace(100.0, fs / 2 - 100.0, 300)
    h_mine = np.abs(sos_response(mine, w, fs))
    _, h_ref = sosfreqz(ref, worN=w, fs=fs)
    np.testing.assert_allclose(h_mine, np.abs(h_ref), atol=2e-6)


def test_butterworth_bandpass_matches_scipy():
    from scipy.signal import butter, sosfreqz

    fs = 48_000.0
    mine = butterworth_sos(3, 3_000.0, 6_000.0, kind="bandpass", fs=fs)
    ref = butter(3, [3_000.0, 6_000.0], btype="band", fs=fs,
                 output="sos")
    w = np.linspace(100.0, fs / 2 - 100.0, 300)
    h_mine = np.abs(sos_response(mine, w, fs))
    _, h_ref = sosfreqz(ref, worN=w, fs=fs)
    np.testing.assert_allclose(h_mine, np.abs(h_ref), atol=1e-5)


def test_streaming_equals_oneshot_complex():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)
         ).astype(np.complex128)
    sos = butterworth_sos(4, 0.1, kind="lowpass", fs=1.0)
    one = IIRFilter(sos)(x)
    f = IIRFilter(sos)
    parts = [f(x[i:i + 700]) for i in range(0, len(x), 700)]
    np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-12)


def test_lowpass_attenuates_stopband():
    fs = 1_000_000.0
    n = 1 << 15
    t = np.arange(n) / fs
    x = (np.exp(2j * np.pi * 10e3 * t)
         + np.exp(2j * np.pi * 200e3 * t)).astype(np.complex64)
    y = IIRFilter(butterworth_sos(5, 50e3, fs=fs))(x)
    spec = np.abs(np.fft.fft(y[n // 2:]))
    freqs = np.fft.fftfreq(n // 2, 1 / fs)
    p_pass = spec[np.argmin(np.abs(freqs - 10e3))]
    p_stop = spec[np.argmin(np.abs(freqs - 200e3))]
    assert p_pass > 100 * p_stop


def test_notch_kills_tone():
    fs = 48_000.0
    n = 1 << 14
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 1_000.0 * t) + np.sin(2 * np.pi * 5_000.0 * t)
    y = IIRFilter(notch_sos(5_000.0, q=10.0, fs=fs))(x)
    spec = np.abs(np.fft.rfft(y[n // 2:]))
    freqs = np.fft.rfftfreq(n // 2, 1 / fs)
    a_keep = spec[np.argmin(np.abs(freqs - 1_000.0))]
    a_notch = spec[np.argmin(np.abs(freqs - 5_000.0))]
    assert a_keep > 50 * a_notch


def test_design_validation():
    with pytest.raises(ValueError):
        butterworth_sos(0, 0.1)
    with pytest.raises(ValueError):
        butterworth_sos(3, 0.6, fs=1.0)          # beyond Nyquist
    with pytest.raises(ValueError):
        butterworth_sos(3, 0.2, kind="bandpass")  # missing f2
    with pytest.raises(ValueError):
        IIRFilter(np.zeros((2, 5)))


def test_state_promotes_real_to_complex():
    """A real first block must not freeze the carried state real: a
    later complex block's state carry keeps its imaginary part."""
    fs = 48_000.0
    sos = butterworth_sos(4, 4_000.0, fs=fs)
    n = 4096
    t = np.arange(2 * n) / fs
    x = np.exp(2j * np.pi * 1_000.0 * t).astype(np.complex128)

    mixed = IIRFilter(sos)
    y0 = mixed(x[:n].real.copy())          # real first block
    y1 = mixed(x[n:])                      # complex second block

    ref = IIRFilter(sos)
    r0 = ref(x[:n].real.astype(np.complex128))
    r1 = ref(x[n:])
    assert np.allclose(y0, r0.real, atol=1e-12)
    assert np.allclose(y1, r1, atol=1e-12)
    assert np.abs(y1.imag[-100:]).max() > 0.1
