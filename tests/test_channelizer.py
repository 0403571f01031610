import numpy as np
import pytest

from sigdigger_tpu.dsp.channelizer import Channelizer, channel_filter_response


def make_tone(n, f, fs, amp=1.0, phase0=0.0, start=0):
    k = np.arange(start, start + n, dtype=np.float64)
    return (amp * np.exp(1j * (2 * np.pi * f * k / fs + phase0))).astype(
        np.complex64
    )


def test_filter_response_shape():
    r = channel_filter_response(64, 16.0)
    assert r.shape == (64,)
    assert r[0] == 1.0
    # stopband near the edge rolls toward zero
    assert r[32] < 0.05


def test_tone_extraction_on_bin_center():
    """A tone at an exact bin center must come out at DC with amplitude 1."""
    fs = 1_024_000.0
    ch = Channelizer(fs, fft_size=1024)
    f0 = 128_000.0  # bin 128
    h = ch.open(f0, bw=16_000.0)
    x = make_tone(8192, f0, fs)
    out = np.asarray(ch.feed(x)[h])
    # skip transient (first sub-frame)
    tail = out[ch._buckets[ch.slot_of(h)[0]].n_sub:]
    assert np.allclose(np.abs(tail), 1.0, atol=0.02)
    # at DC: phase nearly constant
    dphase = np.angle(tail[1:] * np.conj(tail[:-1]))
    assert np.max(np.abs(dphase)) < 1e-2


def test_tone_extraction_off_bin_center():
    """Sub-bin offsets are corrected by the residual NCQO."""
    fs = 1_024_000.0
    ch = Channelizer(fs, fft_size=1024)
    f0 = 128_400.0  # 0.4 bins off center
    h = ch.open(f0, bw=16_000.0)
    x = make_tone(16384, f0, fs)
    out = np.asarray(ch.feed(x)[h])
    n_sub = ch.slot_of(h)[0]
    tail = out[n_sub:]
    dphase = np.angle(tail[1:] * np.conj(tail[:-1]))
    # median phase step ~0; small excursions are passband ripple
    assert np.abs(np.median(dphase)) < 1e-3
    assert np.max(np.abs(dphase)) < 5e-2
    assert np.allclose(np.abs(tail), 1.0, atol=0.05)


def test_block_continuity():
    """Feeding in multiple blocks must be phase-continuous with one shot."""
    fs = 512_000.0
    f0 = 37_000.0
    freq_off = 1200.0
    ntot = 32768

    ch1 = Channelizer(fs, fft_size=512)
    h1 = ch1.open(f0, bw=8000.0)
    x = make_tone(ntot, f0 + freq_off, fs)
    ref = np.asarray(ch1.feed(x)[h1])

    ch2 = Channelizer(fs, fft_size=512)
    h2 = ch2.open(f0, bw=8000.0)
    parts = []
    for i in range(4):
        blk = x[i * ntot // 4:(i + 1) * ntot // 4]
        parts.append(np.asarray(ch2.feed(blk)[h2]))
    got = np.concatenate(parts)
    assert np.allclose(got, ref, atol=1e-3)


def test_decimation_rate():
    fs = 2_048_000.0
    ch = Channelizer(fs, fft_size=2048)
    h = ch.open(100_000.0, bw=10_000.0)
    d = ch.decimation(h)
    assert d * ch.slot_of(h)[0] == 2048
    out = ch.feed(np.zeros(4096, np.complex64))[h]
    assert out.shape[0] == 4096 // d


def test_two_channels_independent():
    """Two tones, two channels — each extracts only its own tone."""
    fs = 1_024_000.0
    ch = Channelizer(fs, fft_size=1024)
    fa, fb = 100_000.0, -200_000.0
    ha = ch.open(fa, bw=20_000.0)
    hb = ch.open(fb, bw=20_000.0)
    x = make_tone(16384, fa, fs) + make_tone(16384, fb, fs, amp=0.5)
    out = ch.feed(x)
    a = np.asarray(out[ha])
    b = np.asarray(out[hb])
    na = ch.slot_of(ha)[0]
    assert np.allclose(np.abs(a[na:]), 1.0, atol=0.05)
    assert np.allclose(np.abs(b[na:]), 0.5, atol=0.05)


def test_rejection_out_of_band():
    """Energy far outside the channel must be strongly attenuated."""
    fs = 1_024_000.0
    ch = Channelizer(fs, fft_size=1024)
    h = ch.open(0.0, bw=10_000.0)
    x = make_tone(16384, 300_000.0, fs)  # way out of band
    out = np.asarray(ch.feed(x)[h])
    n_sub = ch.slot_of(h)[0]
    assert np.max(np.abs(out[n_sub:])) < 1e-3


def test_close_and_reopen():
    fs = 1_000_000.0
    ch = Channelizer(fs, fft_size=1024)
    h1 = ch.open(10_000.0, bw=5000.0)
    h2 = ch.open(20_000.0, bw=5000.0)
    ch.close(h1)
    out = ch.feed(np.zeros(2048, np.complex64))
    assert h1 not in out and h2 in out
    h3 = ch.open(-50_000.0, bw=5000.0)
    out = ch.feed(np.zeros(2048, np.complex64))
    assert h3 in out


def test_bad_block_length():
    ch = Channelizer(1e6, fft_size=1024)
    ch.open(0.0, bw=10_000.0)
    with pytest.raises(ValueError):
        ch.feed(np.zeros(1000, np.complex64))
