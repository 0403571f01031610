"""Coverage for paths not exercised elsewhere: pipeline AM demod,
LSB audio, continuous sweep partitioning, resampler bookkeeping."""

import numpy as np

from sigdigger_tpu.pipeline import (
    PipelineConfig,
    init_state,
    jit_pipeline,
    make_constants,
)


def test_pipeline_am_demod():
    cfg = PipelineConfig(sample_rate=1_024_000.0, fft_size=1024,
                         n_channels=2, n_sub=64, demod="am")
    f0s = np.array([100e3, -200e3])
    consts = make_constants(cfg, f0s, np.full(2, 20e3))
    state = init_state(cfg)
    step = jit_pipeline(cfg)
    n = 1 << 17
    t = np.arange(n) / cfg.sample_rate
    msg = 0.5 * np.sin(2 * np.pi * 700.0 * t)
    x = ((1.0 + msg) * np.exp(2j * np.pi * 100e3 * t)).astype(
        np.complex64)
    audio = []
    for i in range(0, n, 1 << 15):
        state, out = step(consts, state, x[i:i + (1 << 15)])
        audio.append(np.asarray(out["audio"]))
    a = np.concatenate(audio, axis=1)[0][3000:]
    rate = cfg.channel_rate
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = (np.argmax(spec[5:]) + 5) * rate / len(a)
    assert abs(f_pk - 700.0) < 30.0


def test_audio_lsb_demod():
    from sigdigger_tpu.inspectors import make_inspector

    rate = 16_000.0
    insp = make_inspector("audio", rate)
    insp.set_config({"audio.demodulator": 4, "audio.sample-rate":
                     int(rate), "audio.cutoff": 3000.0,
                     "agc.enabled": False})
    # LSB convention: channel centered cutoff/2 below the carrier; a
    # voice tone at -1 kHz appears at baseband +cutoff/2 - 1k = +500 Hz
    n = 1 << 14
    t = np.arange(n) / rate
    x = np.exp(2j * np.pi * 500.0 * t).astype(np.complex64)[None, :]
    audio = np.asarray(insp.process(x)["samples"])[0][2000:]
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    f_pk = np.argmax(spec) * rate / len(audio)
    assert abs(f_pk - 1000.0) < 20.0


def test_sweep_continuous_partitioning():
    from sigdigger_tpu.analyzer.sweep import Scanner
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.sources.synth import Emitter, SynthBandSource
    from sigdigger_tpu.types import SpectrumPartitioning, SweepStrategy

    prof = SourceProfile(type="synth", sample_rate=2_048_000,
                         noise_db=-60.0)
    src = SynthBandSource(prof, [Emitter(102.0e6, 1.0)])
    sc = Scanner(src, 100e6, 104e6,
                 strategy=SweepStrategy.PROGRESSIVE,
                 partitioning=SpectrumPartitioning.CONTINUOUS,
                 resolution_hz=4000.0)
    psd = sc.sweep(hops=24)
    freqs = sc.view.frequencies()
    i = np.argmin(np.abs(freqs - 102.0e6))
    assert psd[max(0, i - 8):i + 8].max() > 20 * np.median(psd)


def test_resampler_output_count_bookkeeping():
    from sigdigger_tpu.dsp import Resampler

    r = Resampler(48000.0, 44100.0, channels=1)
    total_out = 0
    total_pred = 0
    rng = np.random.default_rng(0)
    for n in (1000, 777, 4096, 123):
        pred = r.output_count(n)
        y = r(rng.standard_normal(n).astype(np.complex64)[None, :])
        total_out += y.shape[1]
        total_pred += pred
        assert y.shape[1] == pred
    total_in = 1000 + 777 + 4096 + 123
    assert abs(total_out - total_in * 44100 / 48000) < 2


def test_costas_order8():
    from sigdigger_tpu.dsp import CostasLoop

    rng = np.random.default_rng(0)
    syms = rng.integers(0, 8, 4000)
    bb = np.repeat(np.exp(1j * 2 * np.pi * syms / 8), 4).astype(
        np.complex64)
    k = np.arange(len(bb))
    x = (bb * np.exp(2j * np.pi * 0.0005 * k)).astype(np.complex64)
    loop = CostasLoop(1, loop_bw=0.002, order=8)
    y = np.asarray(loop(x[None, :]))[0]
    tail = y[len(y) // 2:]
    conc = np.abs(np.mean(np.exp(1j * np.angle(tail ** 8))))
    assert conc > 0.7, conc
