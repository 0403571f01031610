"""2-D-tiled fused channelizer v2 (interpret mode)."""

import numpy as np

from sigdigger_tpu.kernels.channelizer2 import (
    MatChannelizer2,
    MatChannelizer2Config,
)


def cfg2(block_out=1024, m_tile=256):
    return MatChannelizer2Config(
        sample_rate=256_000.0, n_channels=8, taps=32, decimation=8,
        audio_taps=16, audio_decim=4, block_out=block_out,
        m_tile=m_tile, channel_tile=8,
    )


def test_v2_demodulates_fm():
    cfg = cfg2()
    f0s = np.linspace(-100e3, 90e3, 8)
    mc = MatChannelizer2(cfg, f0s, bw=8e3, interpret=True)
    n = cfg.block_in * 3
    t = np.arange(n) / cfg.sample_rate
    fm, dev = 200.0, 2000.0
    msg = np.sin(2 * np.pi * fm * t)
    phase = 2 * np.pi * f0s[5] * t + \
        2 * np.pi * dev * np.cumsum(msg) / cfg.sample_rate
    x = np.exp(1j * phase).astype(np.complex64)
    audio = np.concatenate(
        [mc.feed(x[i * cfg.block_in:(i + 1) * cfg.block_in])
         for i in range(3)], axis=0)[:, 5]
    a = audio[cfg.audio_out:]
    rate = cfg.channel_rate / cfg.audio_decim
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = (np.argmax(spec[2:]) + 2) * rate / len(a)
    assert abs(f_pk - fm) < 30.0


def test_v2_tiling_invariance():
    """m_tile must not change results: (1024, 256) == (1024, 1024)."""
    f0s = np.linspace(-100e3, 90e3, 8)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(8192 * 2) +
         1j * rng.standard_normal(8192 * 2)).astype(np.complex64)

    a_tiled = MatChannelizer2(cfg2(1024, 256), f0s, 8e3, interpret=True)
    b_flat = MatChannelizer2(cfg2(1024, 1024), f0s, 8e3, interpret=True)
    out_a = np.concatenate([a_tiled.feed(x[:8192]),
                            a_tiled.feed(x[8192:])], axis=0)
    out_b = np.concatenate([b_flat.feed(x[:8192]),
                            b_flat.feed(x[8192:])], axis=0)
    assert np.allclose(out_a, out_b, atol=1e-4)


def test_v2_block_split_exact():
    """v2 carries the audio-FIR tail: block splits are exact."""
    f0s = np.linspace(-100e3, 90e3, 8)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(8192 * 2) +
         1j * rng.standard_normal(8192 * 2)).astype(np.complex64)
    small = MatChannelizer2(cfg2(1024, 256), f0s, 8e3, interpret=True)
    got = np.concatenate([small.feed(x[:8192]), small.feed(x[8192:])],
                         axis=0)
    big = MatChannelizer2(
        MatChannelizer2Config(
            sample_rate=256_000.0, n_channels=8, taps=32, decimation=8,
            audio_taps=16, audio_decim=4, block_out=2048, m_tile=256,
            channel_tile=8),
        f0s, 8e3, interpret=True)
    ref = big.feed(x)
    assert np.allclose(got, ref, atol=1e-4)


def test_i16_upload_bf16_drain_equivalence():
    """Transfer-discipline path (int16 IQ upload + bf16 audio drain)
    matches the f32 path within quantization bounds — VERDICT r2
    'halve e2e bytes per block'."""
    import numpy as np

    from sigdigger_tpu.receiver import KernelReceiver

    def mk(**kw):
        return KernelReceiver(
            sample_rate=1_024_000.0,
            f0s=np.linspace(-400e3, 400e3, 8), bw=20e3, mode="fm",
            decimation=16, block_out=512, psd_fft=1024,
            interpret=True, **kw)

    rx_f32 = mk()
    rx_i16 = mk(in_i16=True, audio_bf16=True)
    rng = np.random.default_rng(0)
    n = rx_f32.block_in
    t = np.arange(4 * n) / 1_024_000.0
    x = (0.5 * np.exp(2j * np.pi * (100e3 + 3e3 *
                                    np.sin(2 * np.pi * 400 * t)) * t)
         + 0.05 * (rng.standard_normal(4 * n)
                   + 1j * rng.standard_normal(4 * n))
         ).astype(np.complex64)
    for i in range(4):
        blk = x[i * n:(i + 1) * n]
        a = rx_f32.feed(blk)
        b = rx_i16.feed(blk)
    assert b.audio.dtype == np.float32
    # audio equal within int16-quantization + bf16 rounding
    err = np.abs(b.audio - a.audio)
    assert err.max() < 0.02, err.max()
    # PSD equal within quantization noise floor (relative)
    rel = np.abs(b.psd - a.psd) / (np.abs(a.psd).max())
    assert rel.max() < 0.01, rel.max()


def test_table_rotator_matches_trig_path():
    """snap_grid=True now uses the Q·R phase-table rotator (no
    in-kernel trig — measured 58% of the kernel on chip); outputs
    match the trig path on identical pre-snapped channels."""
    import numpy as np

    from sigdigger_tpu.kernels.channelizer2 import (
        MatChannelizer2,
        MatChannelizer2Config,
    )

    fs = 1_024_000.0
    cfg = MatChannelizer2Config(
        sample_rate=fs, n_channels=8, taps=32, decimation=16,
        audio_taps=32, audio_decim=4, block_out=512, m_tile=256,
        channel_tile=8)
    grid = fs / cfg.block_in
    f0s = np.round(np.linspace(-400e3, 400e3, 8) / grid) * grid
    a = MatChannelizer2(cfg, f0s, bw=30e3, interpret=True,
                        snap_grid=True)
    b = MatChannelizer2(cfg, f0s, bw=30e3, interpret=True,
                        snap_grid=False)
    assert a._table_rot and not b._table_rot
    rng = np.random.default_rng(3)
    for _ in range(3):                       # streaming carries too
        x = (rng.standard_normal(cfg.block_in)
             + 1j * rng.standard_normal(cfg.block_in)
             ).astype(np.complex64)
        np.testing.assert_allclose(a.feed(x), b.feed(x),
                                   rtol=2e-3, atol=2e-4)


def test_fused_psd_matches_standalone():
    """fuse_psd=True folds the Bailey four-step PSD into the
    channelizer's grid (one dispatch serves both); the PSD block
    matches the standalone PallasPSDFromXW on the same window
    buffer."""
    import numpy as np

    from sigdigger_tpu.kernels.channelizer2 import (
        MatChannelizer2,
        MatChannelizer2Config,
    )
    from sigdigger_tpu.kernels.fft import (
        PallasPSDConfig,
        PallasPSDFromXW,
    )

    fs = 4_096_000.0
    cfg = MatChannelizer2Config(
        sample_rate=fs, n_channels=8, taps=64, decimation=64,
        audio_taps=32, audio_decim=4, block_out=1024, m_tile=1024,
        channel_tile=8, fuse_psd=True)
    mc = MatChannelizer2(cfg, np.linspace(-1e6, 1e6, 8), bw=30e3,
                         interpret=True, snap_grid=True)
    psd_cfg = PallasPSDConfig(
        fft_size=4096, frames_per_block=cfg.block_in // 4096,
        frames_per_program=8)
    ref = PallasPSDFromXW(psd_cfg, m_rows=cfg.block_out,
                          sample_rate=fs, interpret=True)
    rng = np.random.default_rng(11)
    t = np.arange(cfg.block_in) / fs
    x = (0.7 * np.exp(2j * np.pi * 500e3 * t)
         + 0.05 * (rng.standard_normal(cfg.block_in)
                   + 1j * rng.standard_normal(cfg.block_in))
         ).astype(np.complex64)
    xw = mc._frame(x)
    audio = np.asarray(mc.feed_packed(xw))
    assert np.all(np.isfinite(audio))
    fused = ref.unpermute(np.asarray(mc.psd_block))
    want = ref.feed(xw)
    np.testing.assert_allclose(fused, want, rtol=2e-4, atol=1e-12)
    # and the peak lands on the injected tone
    freqs = np.fft.fftfreq(4096, 1.0 / fs)
    assert abs(freqs[int(np.argmax(fused))] - 500e3) < 2 * fs / 4096
