"""Offline task library: carrier ops, transforms, sampler, doppler,
export."""

import numpy as np
import pytest

from sigdigger_tpu.dsp.decider import DecisionSpace
from sigdigger_tpu.tasks import (
    AGCTask,
    CarrierDetector,
    CarrierXlator,
    CostasRecoveryTask,
    DelayedConjTask,
    DopplerCalculator,
    ExportCSVTask,
    ExportSamplesTask,
    HistogramFeeder,
    LPFTask,
    MultitaskController,
    PLLSyncTask,
    QuadDemodTask,
    SamplingProperties,
    SyncMode,
    TaskController,
    WaveSampler,
)


def tone(n, f_norm, amp=1.0, phase0=0.0):
    k = np.arange(n)
    return (amp * np.exp(1j * (2 * np.pi * f_norm * k + phase0))).astype(
        np.complex64
    )


def run(task):
    state = task.run()
    assert state.error is None, state.error
    assert state.done
    return state.result


def test_carrier_detector_subbin():
    fs = 100_000.0
    f0 = 12_345.6
    x = tone(10000, f0 / fs)
    est = run(CarrierDetector(x, fs))
    assert abs(est - f0) < 5.0  # sub-bin accuracy (bin = 6.1 Hz)


def test_carrier_detector_negative_freq():
    fs = 50_000.0
    f0 = -20_000.0
    x = tone(8192, f0 / fs)
    est = run(CarrierDetector(x, fs))
    assert abs(est - f0) < 10.0


def test_carrier_xlator_chain():
    fs = 100_000.0
    f0 = 5000.0
    x = tone(8192, f0 / fs)
    det = run(CarrierDetector(x, fs))
    out = run(CarrierXlator(x, fs, det))
    dph = np.angle(out[1:] * np.conj(out[:-1]))
    assert np.abs(np.median(dph)) < 1e-3  # carrier at DC now


def test_lpf_task():
    fs = 100_000.0
    x = tone(16384, 1000.0 / fs) + tone(16384, 30_000.0 / fs, amp=0.5)
    out = run(LPFTask(x, fs, bandwidth=5000.0))
    spec = np.abs(np.fft.fft(out[2048:]))
    freqs = np.fft.fftfreq(len(spec), 1 / fs)
    inband = np.abs(spec[np.argmin(np.abs(freqs - 1000.0))])
    outband = np.abs(spec[np.argmin(np.abs(freqs - 30_000.0))])
    assert inband > 100 * outband


def test_agc_task():
    x = tone(8000, 0.01, amp=37.0)
    out = run(AGCTask(x, tau=50.0))
    assert np.isclose(np.abs(out[4000:]).mean(), 1.0, rtol=0.2)


def test_quad_demod_task():
    x = tone(4096, 0.02)
    out = run(QuadDemodTask(x))
    assert np.allclose(out.real[1:], 2 * 0.02, atol=1e-3)


def test_delayed_conj_task_baud_line():
    # BPSK at 100 samples/symbol: delayed-conj spectrum shows baud line
    rng = np.random.default_rng(0)
    syms = rng.integers(0, 2, 200) * 2 - 1
    x = np.repeat(syms.astype(np.complex64), 100)
    x = x * np.exp(2j * np.pi * 0.013 * np.arange(len(x)))
    out = run(DelayedConjTask(x, delay=50))
    assert out.shape == x.shape
    # delayed conj removes the carrier: x[n]conj(x[n-50]) has constant
    # phase except at symbol transitions
    ph = np.angle(out[200:])
    hist, _ = np.histogram(ph, bins=16, range=(-np.pi, np.pi))
    assert hist.max() > 0.5 * len(ph)


def test_costas_and_pll_tasks():
    fs = 100_000.0
    x = tone(20000, 500.0 / fs)
    out = run(PLLSyncTask(x, fs, loop_bw=2000.0))
    tail = out[15000:]
    dph = np.angle(tail[1:] * np.conj(tail[:-1]))
    assert np.abs(dph).max() < 0.02

    rng = np.random.default_rng(1)
    syms = rng.integers(0, 2, 500) * 2 - 1
    bb = np.repeat(syms.astype(np.complex64), 20)
    xb = bb * np.exp(2j * np.pi * (300.0 / fs) * np.arange(len(bb)))
    out2 = run(CostasRecoveryTask(xb.astype(np.complex64), fs,
                                  arm_bw=10_000.0, loop_bw=1000.0,
                                  order=2))
    tail2 = out2[len(out2) // 2:]
    assert np.mean(np.abs(tail2.real)) > 3 * np.mean(np.abs(tail2.imag))


def test_histogram_feeder():
    x = tone(8192, 0.0, amp=2.0)  # constant amplitude 2
    task = HistogramFeeder(x, space="amplitude", bins=64,
                           limits=(0.0, 4.0))
    hist = run(task)
    assert hist.sum() == 8192
    assert np.argmax(hist) == 32  # amplitude 2.0 of range [0,4) → bin 32


def test_wave_sampler_manual_amplitude():
    bits = np.array([0, 1, 1, 0, 1, 0, 0, 1] * 50)
    x = np.repeat(bits.astype(np.complex64), 25)
    props = SamplingProperties(mode=SyncMode.MANUAL,
                               space=DecisionSpace.AMPLITUDE,
                               baud=4000.0, sample_rate=100_000.0,
                               bits_per_symbol=1)
    sets = run(WaveSampler(x, props))
    ids = sets[0].symbols
    assert len(ids) == len(bits)
    assert np.mean(ids == bits) > 0.99


def test_wave_sampler_gardner_phase():
    rng = np.random.default_rng(2)
    syms = rng.integers(0, 2, 400)
    bb = np.repeat(np.exp(1j * np.pi * syms).astype(np.complex64), 8)
    props = SamplingProperties(mode=SyncMode.GARDNER,
                               space=DecisionSpace.PHASE,
                               baud=12_500.0, sample_rate=100_000.0,
                               bits_per_symbol=1, loop_gain=0.05)
    sets = run(WaveSampler(bb, props))
    got = sets[0].symbols
    assert abs(len(got) - 400) < 6


def test_wave_sampler_zero_crossing():
    bits = np.array([1, 0, 1, 1, 0, 0, 1, 0] * 30)
    x = np.repeat((bits * 2 - 1).astype(np.complex64), 20)
    props = SamplingProperties(mode=SyncMode.ZERO_CROSSING,
                               space=DecisionSpace.AMPLITUDE,
                               baud=5000.0, sample_rate=100_000.0,
                               bits_per_symbol=1, threshold=0.0)
    sets = run(WaveSampler(x, props))
    assert len(sets[0].symbols) > 200


def test_doppler_calculator():
    fs = 10_000.0
    f0 = 437e6  # UHF satellite
    doppler_hz = 2000.0
    x = tone(8192, doppler_hz / fs)
    res = run(DopplerCalculator(x, fs, f0))
    lam = 299_792_458.0 / f0
    expected_v = -doppler_hz * lam
    assert abs(res.center_velocity - expected_v) < 20.0
    assert res.dispersion < 200.0


def test_export_wav_raw_mat_m_csv(tmp_path):
    x = tone(5000, 0.01, amp=0.5)
    fs = 48000.0

    wav = str(tmp_path / "o.wav")
    run(ExportSamplesTask(x, wav, fs))
    from sigdigger_tpu.io.wav import read_wav
    back, rate = read_wav(wav)
    assert rate == 48000 and back.shape == (5000, 2)
    assert np.allclose(back[:, 0] + 1j * back[:, 1], x, atol=1e-6)

    raw = str(tmp_path / "o.raw")
    run(ExportSamplesTask(x, raw, fs))
    assert np.allclose(np.fromfile(raw, np.complex64), x)

    mat = str(tmp_path / "o.mat")
    run(ExportSamplesTask(x, mat, fs))
    from scipy.io import loadmat
    md = loadmat(mat)
    assert np.allclose(md["X"].ravel(), x, atol=1e-6)

    m = str(tmp_path / "o.m")
    run(ExportSamplesTask(x[:50], m, fs))
    assert "X = [" in open(m).read()

    csv = str(tmp_path / "o.csv")
    rows = [(i, float(i) * 0.5) for i in range(100)]
    run(ExportCSVTask(rows, csv, header=["idx", "val"]))
    lines = open(csv).read().strip().split("\n")
    assert lines[0] == "idx,val" and len(lines) == 101

    with pytest.raises(ValueError):
        ExportSamplesTask(x, str(tmp_path / "o.xyz"), fs)


def test_task_controller_and_cancel():
    x = tone(400_000, 0.01)
    task = AGCTask(x, tau=100.0)
    ctl = TaskController()
    seen = []
    ctl.process(task, on_progress=lambda p: seen.append(p.progress))
    state = ctl.wait(timeout=60.0)
    assert state is not None and state.done
    assert seen and seen[-1] >= seen[0]

    # cancellation mid-run
    task2 = AGCTask(tone(2_000_000, 0.01), tau=100.0)
    ctl2 = TaskController()
    ctl2.process(task2)
    task2.cancel()
    state2 = ctl2.wait(timeout=60.0)
    assert state2 is not None and (state2.cancelled or state2.done)


def test_multitask_controller():
    mc = MultitaskController()
    t1 = mc.push("agc", AGCTask(tone(50_000, 0.01), tau=50.0))
    t2 = mc.push("quad", QuadDemodTask(tone(50_000, 0.01)))
    mc.wait_all(timeout=60.0)
    snap = mc.snapshot()
    assert {s["id"] for s in snap} == {t1, t2}
    assert all(s["progress"] == 1.0 for s in snap)
    mc.cleanup()
    assert mc.snapshot() == []


def test_carrier_detector_pallas_estimator():
    """estimator="pallas" routes the detection spectrum through the
    Bailey Pallas PSD (the TPU path, interpret mode here) and agrees
    with the np.fft path within a bin (r4 VERDICT item 7)."""
    fs = 100_000.0
    f0 = 12_345.6
    x = tone(8192, f0 / fs)
    est_np = run(CarrierDetector(x, fs, estimator="numpy"))
    est_pl = run(CarrierDetector(x, fs, estimator="pallas"))
    assert abs(est_np - f0) < 15.0
    assert abs(est_pl - f0) < 15.0
    assert abs(est_pl - est_np) < fs / 8192


def test_doppler_pallas_estimator():
    fs = 50_000.0
    f0 = 437_000_000.0
    lam = 299_792_458.0 / f0
    shift = 2_000.0                        # Hz Doppler
    x = tone(8192, shift / fs)
    a = run(DopplerCalculator(x, fs, f0, estimator="numpy"))
    b = run(DopplerCalculator(x, fs, f0, estimator="pallas"))
    v_want = -shift * lam
    assert abs(a.center_velocity - v_want) < 0.05 * abs(v_want)
    assert abs(b.center_velocity - a.center_velocity) \
        < 0.05 * abs(v_want)


def test_estimators_pallas_backend():
    from sigdigger_tpu.analyzer.estimators import (
        estimate_baud,
        estimate_offset,
    )

    fs = 32_000.0
    n = 4096
    t = np.arange(n) / fs
    baud = 1_000.0
    sym = np.sign(np.sin(2 * np.pi * baud / 2 * t) + 0.3)
    y = (sym * np.exp(2j * np.pi * 500.0 * t)).astype(np.complex64)
    b_np = estimate_baud(y, fs, estimator="numpy")
    b_pl = estimate_baud(y, fs, estimator="pallas")
    assert b_np is not None and b_pl is not None
    assert abs(b_pl - b_np) <= 2 * fs / n
    o_np = estimate_offset(y, fs, estimator="numpy")
    o_pl = estimate_offset(y, fs, estimator="pallas")
    assert abs(o_pl - o_np) < 40.0
