"""Bailey four-step FFT PSD kernel vs numpy FFT (interpret mode)."""

import numpy as np
import pytest

from sigdigger_tpu.kernels.fft import PallasPSD, PallasPSDConfig
from sigdigger_tpu.types import WindowFunction


def make_psd(fft_size=1024, frames=16, rate=1_024_000.0,
             window=WindowFunction.HANN, alpha=1.0):
    cfg = PallasPSDConfig(fft_size=fft_size, frames_per_block=frames,
                          frames_per_program=8)
    return PallasPSD(cfg, rate, window, alpha, interpret=True), cfg


def test_psd_matches_numpy_reference():
    psd, cfg = make_psd()
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(cfg.block_in) +
         1j * rng.standard_normal(cfg.block_in)).astype(np.complex64)
    got = psd.feed(x)

    from sigdigger_tpu.dsp.window import window_taps
    taps = window_taps(WindowFunction.HANN, cfg.fft_size).astype(np.float64)
    frames = x.reshape(-1, cfg.fft_size) * taps
    ref = np.mean(np.abs(np.fft.fft(frames, axis=1)) ** 2, axis=0)
    ref /= psd.sample_rate * np.sum(taps ** 2)
    assert np.allclose(got, ref, rtol=1e-3, atol=1e-10)


def test_psd_tone_peak():
    psd, cfg = make_psd()
    f0 = 200_000.0
    k = np.arange(cfg.block_in)
    x = np.exp(2j * np.pi * f0 / psd.sample_rate * k).astype(np.complex64)
    out = psd.feed(x)
    assert np.argmax(out) == round(f0 / psd.sample_rate * cfg.fft_size)
    shifted = psd.shifted()
    freqs = np.fft.fftshift(np.fft.fftfreq(cfg.fft_size,
                                           1 / psd.sample_rate))
    assert abs(freqs[np.argmax(shifted)] - f0) < 1100.0


def test_psd_ema_across_blocks():
    psd, cfg = make_psd(alpha=0.5)
    k = np.arange(cfg.block_in)
    x1 = np.exp(2j * np.pi * 0.1 * k).astype(np.complex64)
    psd.feed(x1)
    p1 = psd.psd.copy()
    psd.feed(np.zeros(cfg.block_in, np.complex64))
    # EMA decayed toward zero but retains the tone
    assert psd.psd.max() < p1.max()
    assert np.argmax(psd.psd) == np.argmax(p1)


@pytest.mark.parametrize("n,frames", [(256, 8), (4096, 8)])
def test_psd_other_sizes(n, frames):
    cfg = PallasPSDConfig(fft_size=n, frames_per_block=frames,
                          frames_per_program=frames)
    psd = PallasPSD(cfg, 1e6, WindowFunction.NONE, 1.0, interpret=True)
    k = np.arange(cfg.block_in)
    x = np.exp(2j * np.pi * (5.0 / n) * k).astype(np.complex64)
    out = psd.feed(x)
    assert np.argmax(out) == 5


def test_psd_from_xw_matches_standalone():
    """PallasPSDFromXW reads the channelizer's packed window buffer;
    its frames are the standalone PSD's frames over the history-shifted
    stream (hist + x)[:block_in] — exact equality on that signal."""
    import numpy as np

    from sigdigger_tpu.kernels.channelizer2 import (
        MatChannelizer2,
        MatChannelizer2Config,
    )
    from sigdigger_tpu.kernels.fft import (
        PallasPSD,
        PallasPSDConfig,
        PallasPSDFromXW,
    )
    from sigdigger_tpu.types import WindowFunction

    fs = 1_024_000.0
    ccfg = MatChannelizer2Config(
        sample_rate=fs, n_channels=8, taps=64, decimation=64,
        audio_taps=64, audio_decim=8, block_out=256, m_tile=256,
        channel_tile=8)
    pcfg = PallasPSDConfig(fft_size=4096,
                           frames_per_block=ccfg.block_in // 4096,
                           frames_per_program=2)
    mc = MatChannelizer2(ccfg, np.linspace(-400e3, 400e3, 8), bw=8e3,
                         interpret=True)
    shared = PallasPSDFromXW(pcfg, ccfg.block_out, fs,
                             WindowFunction.BLACKMANN_HARRIS,
                             interpret=True)
    solo = PallasPSD(pcfg, fs, WindowFunction.BLACKMANN_HARRIS,
                     interpret=True)
    rng = np.random.default_rng(0)
    t = np.arange(ccfg.block_in)
    x = (np.exp(2j * np.pi * 100e3 * t / fs)
         + 0.1 * (rng.standard_normal(ccfg.block_in)
                  + 1j * rng.standard_normal(ccfg.block_in))
         ).astype(np.complex64)
    hist = np.zeros(ccfg.taps - 1, np.complex64)
    xw = mc._frame(x)
    got = shared.feed(xw)
    want = solo.feed(np.concatenate([hist, x])[:ccfg.block_in])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-12)


def test_xw_psd_frame_stride():
    """frame_stride folds every s-th frame group (the reference's
    per-interval spectrum duty cycle); a stationary tone yields the
    same peak and level as the full-coverage fold."""
    import numpy as np

    from sigdigger_tpu.kernels.fft import PallasPSDConfig, PallasPSDFromXW

    fs = 1_024_000.0
    n_fft, frames = 4096, 16
    cfg = PallasPSDConfig(fft_size=n_fft, frames_per_block=frames,
                          frames_per_program=2)
    m_rows = cfg.block_in // 64
    full = PallasPSDFromXW(cfg, m_rows, fs, interpret=True)
    strided = PallasPSDFromXW(cfg, m_rows, fs, interpret=True,
                              frame_stride=4)
    t = np.arange(cfg.block_in) / fs
    x = (0.8 * np.exp(2j * np.pi * 128_000.0 * t)).astype(np.complex64)
    xw = np.concatenate([
        x.real.reshape(m_rows, 64), x.imag.reshape(m_rows, 64)])
    a = full.feed(xw)
    b = strided.feed(xw)
    assert np.argmax(a) == np.argmax(b)
    pk = int(np.argmax(a))
    np.testing.assert_allclose(b[pk], a[pk], rtol=1e-3)
