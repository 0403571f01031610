"""Filters, NCQO, quad demod, decider, resampler."""

import numpy as np

from sigdigger_tpu.dsp import (
    NCQO,
    FirFilter,
    QuadDemod,
    Resampler,
    fir_apply,
    fir_lowpass,
    manual_sample,
    mix_frequency,
    quad_demod,
    rrc_taps,
    symbols_to_bits,
)
from sigdigger_tpu.dsp.decider import (
    decide_amplitude,
    decide_frequency,
    decide_phase,
)


def tone(n, f_norm, amp=1.0, phase0=0.0):
    k = np.arange(n)
    return (amp * np.exp(1j * (2 * np.pi * f_norm * k + phase0))).astype(
        np.complex64
    )


# -- filters ----------------------------------------------------------------

def test_fir_lowpass_response():
    h = fir_lowpass(101, 0.25)  # cutoff at fs/8
    spec = np.abs(np.fft.fft(h.astype(np.float64), 4096))
    f = np.fft.fftfreq(4096, 0.5)  # in units of Nyquist
    passband = spec[np.abs(f) < 0.15]
    stopband = spec[(np.abs(f) > 0.4) & (np.abs(f) < 1.0)]
    assert np.allclose(passband, 1.0, atol=0.02)
    assert stopband.max() < 10 ** (-40 / 20)


def test_fir_streaming_equals_oneshot():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(
        np.complex64
    )[None, :]
    taps = fir_lowpass(63, 0.5)
    ref = np.asarray(fir_apply(x, taps))
    f = FirFilter(taps, channels=1)
    got = np.concatenate(
        [np.asarray(f(x[:, :700])), np.asarray(f(x[:, 700:1500])),
         np.asarray(f(x[:, 1500:]))], axis=1
    )
    assert np.allclose(got, ref, atol=1e-5)


def test_rrc_nyquist_property():
    """RRC convolved with itself (RC) must be ~ISI-free at symbol spacing."""
    sps = 8
    h = rrc_taps(sps, span=12, rolloff=0.35).astype(np.float64)
    rc = np.convolve(h, h)
    center = len(rc) // 2
    peak = rc[center]
    isi = [rc[center + k * sps] for k in range(1, 5)]
    assert np.isclose(peak, 1.0, atol=1e-3)  # unit energy → RC peak 1
    assert np.max(np.abs(isi)) < 0.01 * peak


# -- NCQO -------------------------------------------------------------------

def test_ncqo_mixdown_and_continuity():
    fs = 100000.0
    f0 = 12345.0
    x = tone(8192, f0 / fs)
    osc = NCQO(-f0, fs)
    y1 = np.asarray(osc.mix(x[:4096]))
    y2 = np.asarray(osc.mix(x[4096:]))
    y = np.concatenate([y1, y2])
    assert np.allclose(y, 1.0, atol=1e-3)  # mixed to DC
    ref = np.asarray(mix_frequency(x, -f0, fs))
    assert np.allclose(y, ref, atol=1e-3)


# -- quad demod -------------------------------------------------------------

def test_quad_demod_constant_freq():
    f = 0.01
    x = tone(1000, f)
    y = np.asarray(quad_demod(x, gain=1.0))
    assert np.allclose(y[1:], 2 * np.pi * f, atol=1e-4)


def test_quad_demod_streaming():
    x = tone(2000, 0.013)[None, :]
    ref = np.asarray(quad_demod(x, gain=1.0))
    qd = QuadDemod(1, gain=1.0)
    got = np.concatenate(
        [np.asarray(qd(x[:, :900])), np.asarray(qd(x[:, 900:]))], axis=1
    )
    assert np.allclose(got, ref, atol=1e-5)


def test_quad_demod_fm_sine():
    """FM-modulated sine recovers the modulating waveform."""
    fs = 240000.0
    fm = 1000.0
    dev = 30000.0
    n = 1 << 14
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * fm * t)
    phase = 2 * np.pi * dev * np.cumsum(msg) / fs
    x = np.exp(1j * phase).astype(np.complex64)
    y = np.asarray(quad_demod(x, gain=fs / (2 * np.pi)))[1:]
    corr = np.corrcoef(y, dev * msg[1:])[0, 1]
    assert corr > 0.999
    assert np.isclose(y.max(), dev, rtol=0.01)


# -- decider ----------------------------------------------------------------

def test_decide_phase_qpsk():
    pts = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
    ids = np.asarray(decide_phase(pts, 2, offset=np.pi / 4))
    assert list(ids) == [0, 1, 2, 3]


def test_decide_amplitude_levels():
    v = np.array([0.0, 1.0, 2.0, 3.0]) / 3.0
    ids = np.asarray(decide_amplitude(v, 2, vmax=1.0))
    assert list(ids) == [0, 1, 2, 3]


def test_decide_frequency_and_bits():
    v = np.array([-1.0, -0.4, 0.4, 1.0])
    ids = np.asarray(decide_frequency(v, 2, span=1.0))
    assert list(ids) == [0, 1, 2, 3]
    bits = symbols_to_bits(np.array([0b10, 0b01]), 2)
    assert list(bits) == [1, 0, 0, 1]


# -- manual sampler ---------------------------------------------------------

def test_manual_sample_averages_intervals():
    x = np.repeat(np.array([1, -1, 1, -1, 1], np.complex64), 10)[None, :]
    y = np.asarray(manual_sample(x, period=10.0, phase=0.0))[0]
    assert np.allclose(y, [1, -1, 1, -1, 1], atol=1e-5)


def test_manual_sample_fractional_period():
    # constant signal: any fractional grid must average to the constant
    x = np.full((1, 1000), 2.0 + 1.0j, np.complex64)
    y = np.asarray(manual_sample(x, period=7.3, phase=2.1))[0]
    assert np.allclose(y, 2.0 + 1.0j, atol=1e-4)


# -- resampler --------------------------------------------------------------

def test_resampler_ratio_and_tone():
    r = Resampler(48000.0, 32000.0, channels=1)
    assert (r.l, r.m) == (2, 3)
    f = 1000.0
    x = tone(9600, f / 48000.0)[None, :]
    y = np.asarray(r(x))[0]
    assert len(y) == r.output_count(0) + 6400 or len(y) == 6400
    # output tone at same absolute freq: phase inc 2*pi*f/32000
    tail = y[200:]
    dph = np.angle(tail[1:] * np.conj(tail[:-1]))
    assert np.allclose(dph, 2 * np.pi * f / 32000.0, atol=1e-3)
    assert np.allclose(np.abs(tail), 1.0, atol=0.02)


def test_resampler_streaming_equals_oneshot():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(4000) + 1j * rng.standard_normal(4000)).astype(
        np.complex64
    )[None, :]
    r1 = Resampler(10000.0, 441 * 10.0, channels=1)  # 441/1000
    ref = np.asarray(r1(x))
    r2 = Resampler(10000.0, 441 * 10.0, channels=1)
    got = np.concatenate(
        [np.asarray(r2(x[:, :1300])), np.asarray(r2(x[:, 1300:2600])),
         np.asarray(r2(x[:, 2600:]))], axis=1
    )
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-5)


def test_resampler_upsample():
    r = Resampler(8000.0, 48000.0, channels=1)
    x = tone(800, 0.05)[None, :]
    y = np.asarray(r(x))[0]
    assert len(y) == 4800
    tail = y[100:]
    dph = np.angle(tail[1:] * np.conj(tail[:-1]))
    assert np.allclose(dph, 2 * np.pi * 0.05 / 6, atol=1e-3)
