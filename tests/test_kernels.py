"""Pallas kernel layer, validated in interpreter mode on CPU against
numpy references (the same program later runs compiled on TPU)."""

import numpy as np
import pytest

from sigdigger_tpu.kernels.channelizer import (
    MatChannelizer,
    MatChannelizerConfig,
    make_mat_constants,
    make_windows,
)
from sigdigger_tpu.kernels.ops import atan2


def test_atan2_accuracy():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    y = rng.standard_normal(10000).astype(np.float32) * 3
    x = rng.standard_normal(10000).astype(np.float32) * 3
    got = np.asarray(atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    assert np.max(np.abs(got - ref)) < 1e-4
    # edge cases
    pts = np.array([[0, 1], [0, -1], [1, 0], [-1, 0], [0, 0]], np.float32)
    got2 = np.asarray(atan2(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    ref2 = np.arctan2(pts[:, 0], pts[:, 1])
    assert np.allclose(got2, ref2, atol=1e-4)


def reference_chain(cfg, consts, x, f0s):
    """Numpy model of the fused kernel: mix → FIR → decimate → quad →
    audio FIR."""
    from sigdigger_tpu.dsp.filters import fir_lowpass

    k = np.arange(len(x))
    audio_all = []
    proto = None
    for c, f0 in enumerate(f0s):
        mixed = x * np.exp(-2j * np.pi * f0 / cfg.sample_rate * k)
        h = (consts["h_re"][:, c] + 1j * consts["h_im"][:, c])
        # the taps are modulated; equivalent plain filter = prototype
        proto = np.abs(h[::-1]) if proto is None else proto
        filt = np.convolve(mixed, fir_lowpass(
            cfg.taps, min(1.0, 2.0 * 25e3 / cfg.sample_rate)))[:len(x)]
        y = filt[cfg.decimation - 1::cfg.decimation][:cfg.block_out]
        prev = np.concatenate([[0.0 + 0j], y[:-1]])
        f = np.angle(y * np.conj(prev)) / np.pi
        audio_all.append(f)
    return np.stack(audio_all, axis=1)


@pytest.fixture
def small_cfg():
    return MatChannelizerConfig(
        sample_rate=256_000.0, n_channels=8, taps=32, decimation=8,
        audio_taps=16, audio_decim=4, block_out=256, channel_tile=8,
    )


def test_windows_layout(small_cfg):
    cfg = small_cfg
    x = np.arange(cfg.block_in, dtype=np.complex64)
    hist = -np.arange(cfg.taps - 1, 0, -1).astype(np.complex64)
    w, new_hist = make_windows(cfg, x, hist)
    assert w.shape == (cfg.block_out, cfg.taps)
    # window m ends at x[m*D]
    for m in (0, 1, 100, cfg.block_out - 1):
        assert w[m, -1] == x[m * cfg.decimation]
    assert np.array_equal(new_hist, x[-(cfg.taps - 1):])


def test_mat_channelizer_extracts_tone(small_cfg):
    """A pure tone at a channel center demodulates to ~zero frequency;
    a tone offset by df demodulates to a constant f = df/(rate/2pi)."""
    cfg = small_cfg
    f0s = np.linspace(-100e3, 90e3, cfg.n_channels)
    mc = MatChannelizer(cfg, f0s, bw=8e3, interpret=True)

    df = 1000.0  # offset inside channel 3
    k = np.arange(cfg.block_in * 3)
    x = np.exp(2j * np.pi * (f0s[3] + df) / cfg.sample_rate * k).astype(
        np.complex64)
    outs = [mc.feed(x[i * cfg.block_in:(i + 1) * cfg.block_in])
            for i in range(3)]
    audio = np.concatenate(outs, axis=0)     # [Ma*3, C]
    # discriminator: f = angle-step/pi = 2*df/channel_rate
    expected = 2.0 * df / cfg.channel_rate
    got = np.median(audio[cfg.audio_out:, 3])
    assert abs(got - expected) < 0.02 * max(1.0, abs(expected)), \
        (got, expected)
    # note: other channels emit a deterministic wrapped constant (a
    # discriminator has no amplitude gate); rejection is asserted at the
    # DSP layer (test_channelizer.py::test_rejection_out_of_band)


def test_mat_channelizer_fm_message(small_cfg):
    """FM-modulated station recovered through the fused kernel."""
    cfg = small_cfg
    f0s = np.linspace(-100e3, 90e3, cfg.n_channels)
    mc = MatChannelizer(cfg, f0s, bw=8e3, interpret=True)
    n = cfg.block_in * 4
    t = np.arange(n) / cfg.sample_rate
    fm, dev = 200.0, 2000.0
    msg = np.sin(2 * np.pi * fm * t)
    phase = 2 * np.pi * f0s[5] * t + \
        2 * np.pi * dev * np.cumsum(msg) / cfg.sample_rate
    x = np.exp(1j * phase).astype(np.complex64)
    outs = [mc.feed(x[i * cfg.block_in:(i + 1) * cfg.block_in])
            for i in range(4)]
    audio = np.concatenate(outs, axis=0)[:, 5]
    a = audio[cfg.audio_out:]
    audio_rate = cfg.channel_rate / cfg.audio_decim
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = np.argmax(spec[2:]) + 2
    assert abs(f_pk * audio_rate / len(a) - fm) < 30.0


def test_mat_channelizer_block_continuity(small_cfg):
    """Feeding split blocks equals one concatenated run (state carry)."""
    cfg = small_cfg
    f0s = np.linspace(-100e3, 90e3, cfg.n_channels)
    rng = np.random.default_rng(0)
    n = cfg.block_in * 2
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)

    mc1 = MatChannelizer(cfg, f0s, bw=8e3, interpret=True)
    a1 = np.concatenate([mc1.feed(x[:cfg.block_in]),
                         mc1.feed(x[cfg.block_in:])], axis=0)

    cfg2 = MatChannelizerConfig(
        sample_rate=cfg.sample_rate, n_channels=cfg.n_channels,
        taps=cfg.taps, decimation=cfg.decimation,
        audio_taps=cfg.audio_taps, audio_decim=cfg.audio_decim,
        block_out=cfg.block_out * 2, channel_tile=cfg.channel_tile,
    )
    mc2 = MatChannelizer(cfg2, f0s, bw=8e3, interpret=True)
    a2 = mc2.feed(x)
    # audio FIR banding differs at the block seam only for the first
    # audio_taps/audio_decim rows of block 2
    seam = cfg.audio_out
    skip = cfg.audio_taps // cfg.audio_decim
    assert np.allclose(a1[:seam], a2[:seam], atol=1e-4)
    assert np.allclose(a1[seam + skip:], a2[seam + skip:], atol=1e-4)
