"""KernelReceiver: the all-kernel streaming path (interpret mode)."""

import numpy as np

from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.receiver import KernelReceiver
from sigdigger_tpu.sources.synth import Emitter, SynthBandSource


def test_receiver_fm_end_to_end():
    fs = 2_048_000.0
    f0s = np.array([-500e3, -100e3, 300e3, 700e3])
    rx = KernelReceiver(fs, f0s, bw=100e3, mode="fm", decimation=32,
                        block_out=1024, psd_fft=1024, interpret=True)
    # FM station on channel 2
    prof = SourceProfile(type="synth", sample_rate=int(fs),
                         noise_db=-70.0)
    src = SynthBandSource(prof, [Emitter(freq=300e3, amplitude=1.0,
                                         fm_rate=1000.0, fm_dev=8000.0)])
    blocks = list(rx.run(src, max_blocks=4))
    assert len(blocks) == 4
    audio = np.concatenate([b.audio for b in blocks], axis=0)
    a = audio[audio.shape[0] // 2:, 2]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = (np.argmax(spec[2:]) + 2) * rx.audio_rate / len(a)
    assert abs(f_pk - 1000.0) < 100.0
    # PSD shows the station
    psd = np.fft.fftshift(blocks[-1].psd)
    freqs = np.linspace(-fs / 2, fs / 2, len(psd), endpoint=False)
    assert abs(freqs[np.argmax(psd)] - 300e3) < 5e3


def test_receiver_psk_end_to_end():
    from sigdigger_tpu.dsp.filters import rrc_taps

    fs = 1_024_000.0
    f0s = np.array([-200e3, 100e3])
    # channel rate = fs/32 = 32 kHz; baud 8k → sps 4
    rx = KernelReceiver(fs, f0s, bw=40e3, mode="psk", decimation=32,
                        block_out=512, psd_fft=512, baud=8000.0,
                        psk_order=4, interpret=True)
    rng = np.random.default_rng(0)
    nsym = 2048
    syms = rng.integers(0, 4, nsym)
    up = np.zeros(nsym * 4, np.complex64)
    up[::4] = np.exp(1j * np.pi / 2 * syms)
    bb = np.convolve(up, rrc_taps(4, span=8, rolloff=0.35)
                     )[:nsym * 4].astype(np.complex64)
    # upconvert to both channel carriers at the full rate
    n = len(bb) * 32
    bb32 = np.repeat(bb, 32)
    t = np.arange(n)
    x = (bb32 * np.exp(2j * np.pi * (-200e3) * t / fs) +
         bb32 * np.exp(2j * np.pi * 100e3 * t / fs)).astype(np.complex64)

    blocks = []
    for i in range(0, n - rx.block_in + 1, rx.block_in):
        blocks.append(rx.feed(x[i:i + rx.block_in]))
    soft = np.concatenate([b.symbols for b in blocks], axis=0)
    strobes = np.concatenate([b.strobes for b in blocks], axis=0)
    for c in range(2):
        got = soft[:, c][strobes[:, c]]
        tail = got[len(got) // 2:]
        conc = np.abs(np.mean(np.exp(1j * np.angle(tail ** 4))))
        assert conc > 0.85, (c, conc)


def test_receiver_pipelined_matches_sequential():
    """Depth-2 in-flight draining must be numerically identical to the
    synchronous feed path (same kernels, same order of EMA folds)."""
    fs = 2_048_000.0
    f0s = np.array([-500e3, -100e3, 300e3, 700e3])
    prof = SourceProfile(type="synth", sample_rate=int(fs),
                         noise_db=-70.0)
    emit = [Emitter(freq=300e3, amplitude=1.0, fm_rate=1000.0,
                    fm_dev=8000.0)]

    def run(depth):
        rx = KernelReceiver(fs, f0s, bw=100e3, mode="fm", decimation=32,
                            block_out=1024, psd_fft=1024,
                            interpret=True)
        src = SynthBandSource(prof, emit, seed=3)
        return list(rx.run(src, max_blocks=4, pipeline_depth=depth))

    seq, pipe = run(1), run(3)
    for a, b in zip(seq, pipe):
        np.testing.assert_allclose(a.audio, b.audio, rtol=1e-6)
        np.testing.assert_allclose(a.psd, b.psd, rtol=1e-6)


def test_receiver_snap_grid_quantization():
    """snap_grid quantizes centers to fs/block_in and keeps the rotator
    phase constant across blocks: a snapped receiver must match an
    unsnapped receiver configured at exactly the snapped frequencies."""
    fs = 2_048_000.0
    block_out, decim = 1024, 32
    grid = fs / (block_out * decim)
    f0s_raw = np.array([-500e3 + 0.3 * grid, 300e3 - 0.4 * grid])
    f0s_snap = np.round(f0s_raw / grid) * grid
    prof = SourceProfile(type="synth", sample_rate=int(fs),
                         noise_db=-70.0)
    emit = [Emitter(freq=float(f0s_snap[1]), amplitude=1.0,
                    fm_rate=1000.0, fm_dev=8000.0)]

    def run(f0s, snap):
        rx = KernelReceiver(fs, f0s, bw=100e3, mode="fm",
                            decimation=decim, block_out=block_out,
                            psd_fft=1024, interpret=True,
                            snap_grid=snap)
        src = SynthBandSource(prof, emit, seed=5)
        return np.concatenate(
            [b.audio for b in rx.run(src, max_blocks=3)], axis=0)

    a = run(f0s_raw, True)           # snapped internally
    b = run(f0s_snap, False)         # explicit grid centers, live phi
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_receiver_fm_audio_decim_32():
    """The bench's realistic audio tap: audio_decim=32 (50 kHz-class
    audio instead of 200 kHz) must still demodulate a clean FM tone
    through the fused kernel."""
    fs = 2_048_000.0
    f0s = np.array([-500e3, -100e3, 300e3, 700e3])
    rx = KernelReceiver(fs, f0s, bw=100e3, mode="fm", decimation=32,
                        block_out=2048, psd_fft=1024, interpret=True,
                        audio_decim=32)
    assert rx.audio_rate == fs / 32 / 32
    prof = SourceProfile(type="synth", sample_rate=int(fs),
                         noise_db=-70.0)
    src = SynthBandSource(prof, [Emitter(freq=300e3, amplitude=1.0,
                                         fm_rate=200.0,
                                         fm_dev=8000.0)])
    blocks = list(rx.run(src, max_blocks=4))
    audio = np.concatenate([b.audio for b in blocks], axis=0)
    a = audio[audio.shape[0] // 2:, 2]
    a = a - a.mean()
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = np.argmax(spec[1:]) + 1
    assert abs(f_pk * rx.audio_rate / len(a) - 200.0) < 40.0
    # modulation tone dominates everything else
    others = np.delete(spec, [f_pk - 1, f_pk, f_pk + 1])
    assert spec[f_pk] > 5 * others.max()


def test_receiver_fm_int8_upload():
    """in_i8=True (int8 packed uploads, the wire precision of 8-bit
    SDR front ends): FM demod stays clean at the -36 dBFS quantization
    floor."""
    fs = 2_048_000.0
    f0s = np.array([-500e3, -100e3, 300e3, 700e3])
    rx = KernelReceiver(fs, f0s, bw=100e3, mode="fm", decimation=32,
                        block_out=1024, psd_fft=1024, interpret=True,
                        in_i8=True)
    prof = SourceProfile(type="synth", sample_rate=int(fs),
                         noise_db=-70.0)
    src = SynthBandSource(prof, [Emitter(freq=300e3, amplitude=0.8,
                                         fm_rate=1000.0,
                                         fm_dev=8000.0)])
    blocks = list(rx.run(src, max_blocks=4))
    audio = np.concatenate([b.audio for b in blocks], axis=0)
    a = audio[audio.shape[0] // 2:, 2]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = (np.argmax(spec[2:]) + 2) * rx.audio_rate / len(a)
    assert abs(f_pk - 1000.0) < 100.0
    psd = np.fft.fftshift(blocks[-1].psd)
    freqs = np.linspace(-fs / 2, fs / 2, len(psd), endpoint=False)
    assert abs(freqs[np.argmax(psd)] - 300e3) < 9e3


def test_receiver_fused_psd_path():
    """The Bailey-compatible serving geometry fuses the PSD into the
    channelizer dispatch (r5); the receiver's PSD and audio both come
    out of the one kernel and match expectations."""
    fs = 2_048_000.0
    rx = KernelReceiver(
        sample_rate=fs, f0s=np.array([-500e3, 250e3]), bw=30e3,
        mode="fm", decimation=64, block_out=512, psd_fft=4096,
        interpret=True, snap_grid=True)
    assert rx._chan.cfg.fuse_psd
    f0 = rx._chan.f0s[1]
    n = rx.block_in * 4
    t = np.arange(n) / fs
    x = np.exp(1j * (2 * np.pi * f0 * t
                     + 2 * np.pi * 2e3 * np.cumsum(
                         np.sin(2 * np.pi * 300.0 * t)) / fs)
               ).astype(np.complex64)
    blk = None
    for i in range(0, n, rx.block_in):
        blk = rx.feed(x[i:i + rx.block_in])
    assert blk.audio.shape[1] == 2
    assert np.all(np.isfinite(blk.audio))
    freqs = np.fft.fftshift(np.fft.fftfreq(4096, 1.0 / fs))
    pk = freqs[int(np.argmax(np.fft.fftshift(blk.psd)))]
    assert abs(pk - f0) < 5e3, (pk, f0)
