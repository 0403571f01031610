"""Inspector chains: raw, power, audio, psk, fsk, ask."""

import numpy as np
import pytest

from sigdigger_tpu.dsp.filters import fir_apply, rrc_taps
from sigdigger_tpu.inspectors import inspector_classes, make_inspector


def test_registry_complete():
    assert inspector_classes() == ["ask", "audio", "fsk", "power", "psk",
                                   "raw"]
    with pytest.raises(ValueError):
        make_inspector("bogus", 1000.0)


def test_raw_passthrough_no_agc():
    insp = make_inspector("raw", 8000.0)
    insp.set_config({"agc.enabled": False, "agc.gain": 2.0})
    x = (np.ones(100) * (1 + 1j)).astype(np.complex64)[None, :]
    out = insp.process(x)
    assert np.allclose(np.asarray(out["samples"]), 2.0 * x)


def test_power_rms_integration():
    insp = make_inspector("power", 1000.0)
    insp.set_config({"power.integrate-samples": 100})
    x = np.full((1, 250), 3.0 + 4.0j, np.complex64)  # |x| = 5
    out1 = insp.process(x)
    assert out1["samples"].shape == (1, 2)
    assert np.allclose(out1["samples"], 5.0, rtol=1e-6)
    # 50 leftover carried; feeding 50 more completes the third window
    out2 = insp.process(x[:, :50])
    assert out2["samples"].shape == (1, 1)
    assert np.allclose(out2["samples"], 5.0, rtol=1e-6)


def test_audio_fm_demod():
    rate = 50_000.0
    insp = make_inspector("audio", rate)
    insp.set_config({
        "audio.demodulator": 2, "audio.sample-rate": int(rate),
        "audio.cutoff": 5000.0, "agc.enabled": False,
        "audio.volume": 1.0,
    })
    n = 1 << 15
    t = np.arange(n) / rate
    msg = np.sin(2 * np.pi * 400.0 * t)
    dev = 4000.0
    phase = 2 * np.pi * dev * np.cumsum(msg) / rate
    x = np.exp(1j * phase).astype(np.complex64)[None, :]
    audio = np.asarray(insp.process(x)["samples"])[0]
    a = audio[2000:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_peak = np.argmax(spec) * rate / len(a)
    assert abs(f_peak - 400.0) < 10.0


def test_audio_am_demod():
    rate = 48_000.0
    insp = make_inspector("audio", rate)
    insp.set_config({"audio.demodulator": 1, "audio.sample-rate": int(rate),
                     "audio.cutoff": 5000.0, "agc.enabled": False})
    n = 1 << 15
    t = np.arange(n) / rate
    msg = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    x = ((1.0 + msg) * np.exp(1j * 0.3)).astype(np.complex64)[None, :]
    audio = np.asarray(insp.process(x)["samples"])[0][4000:]
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    f_peak = np.argmax(spec) * rate / len(audio)
    assert abs(f_peak - 1000.0) < 10.0
    # amplitude ~0.5 (DC removed)
    assert 0.3 < np.percentile(np.abs(audio), 99) < 0.65


def test_audio_usb_demod():
    rate = 16_000.0
    insp = make_inspector("audio", rate)
    insp.set_config({"audio.demodulator": 3, "audio.sample-rate": int(rate),
                     "audio.cutoff": 3000.0, "agc.enabled": False})
    # LO convention: channel centered cutoff/2 into the USB band; a
    # voice tone at 1 kHz appears at baseband −cutoff/2 + 1 kHz = −500 Hz
    n = 1 << 14
    t = np.arange(n) / rate
    x = np.exp(2j * np.pi * (-500.0) * t).astype(np.complex64)[None, :]
    audio = np.asarray(insp.process(x)["samples"])[0][2000:]
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    f_peak = np.argmax(spec) * rate / len(audio)
    assert abs(f_peak - 1000.0) < 20.0


def test_audio_squelch_gates_output():
    rate = 8000.0
    insp = make_inspector("audio", rate)
    insp.set_config({"audio.demodulator": 2, "audio.sample-rate": int(rate),
                     "audio.squelch": True, "audio.squelch-level": 0.5,
                     "agc.enabled": False})
    weak = (0.01 * np.exp(2j * np.pi * 0.01 * np.arange(4096))).astype(
        np.complex64)[None, :]
    out = insp.process(weak)
    assert not out["squelch_open"][0]
    assert np.allclose(np.asarray(out["samples"]), 0.0)


def test_audio_resamples_to_audio_rate():
    rate = 96_000.0
    insp = make_inspector("audio", rate)
    insp.set_config({"audio.demodulator": 2, "audio.sample-rate": 48_000,
                     "agc.enabled": False})
    x = np.exp(2j * np.pi * 0.02 * np.arange(9600)).astype(
        np.complex64)[None, :]
    audio = np.asarray(insp.process(x)["samples"])
    assert audio.shape[1] == 4800


def make_qpsk(nsym, sps, f_off=0.0, seed=0):
    rng = np.random.default_rng(seed)
    syms = rng.integers(0, 4, nsym)
    const = np.exp(1j * (2 * np.pi * syms / 4 + np.pi / 4))
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = const
    taps = rrc_taps(sps, span=8, rolloff=0.35)
    bb = np.array(fir_apply(up, taps))
    k = np.arange(len(bb))
    return (bb * np.exp(2j * np.pi * f_off * k)).astype(np.complex64), syms


def test_psk_inspector_recovers_qpsk():
    rate = 32000.0
    baud = 4000.0  # sps = 8
    x, syms = make_qpsk(3000, 8, f_off=0.001)
    insp = make_inspector("psk", rate)
    insp.set_config({
        "afc.bits-per-symbol": 2, "afc.loop-bw": 0.01,
        "clock.baud": baud, "clock.type": 1, "clock.gain": 0.1,
        "mf.type": 1, "mf.roll-off": 0.35,
        "agc.enabled": True, "agc.ts": 20.0,
    })
    out = insp.process(x[None, :])
    strobes = np.asarray(out["strobes"])[0]
    soft = np.asarray(out["samples"])[0][strobes]
    ids = np.asarray(out["symbols"])[0][strobes]
    assert len(ids) > 2900
    # steady state: differential symbols must match the transmitted
    # differential sequence (Costas phase ambiguity cancels in the diff;
    # filter group delays shift the stream → search a small lag window)
    got_all = np.diff(ids.astype(int)) % 4
    want_all = np.diff(syms.astype(int)) % 4
    half = len(got_all) // 2
    got = got_all[half:half + 1000]
    best = max(
        np.mean(got == want_all[half + lag:half + lag + 1000])
        for lag in range(-20, 21)
    )
    assert best > 0.95, best


def test_fsk_inspector_two_tones():
    rate = 19200.0
    baud = 1200.0  # sps = 16
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 500)
    dev = 0.1  # normalized tone deviation
    freqs = (bits * 2 - 1) * dev * np.pi
    phase = np.cumsum(np.repeat(freqs, 16))
    x = np.exp(1j * phase).astype(np.complex64)
    insp = make_inspector("fsk", rate)
    insp.set_config({"fsk.bits-per-symbol": 1, "clock.baud": baud,
                     "clock.type": 1, "clock.gain": 0.05,
                     "mf.type": 0})
    out = insp.process(x[None, :])
    strobes = np.asarray(out["strobes"])[0]
    ids = np.asarray(out["symbols"])[0][strobes]
    tail = slice(len(ids) // 2, None)
    want = bits[-len(ids):][tail]
    got = ids[tail]
    acc = max(np.mean(got == want), np.mean(1 - got == want))
    assert acc > 0.95, acc


def test_ask_inspector_ook():
    rate = 9600.0
    baud = 600.0  # sps = 16
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, 400)
    x = np.repeat(bits.astype(np.float32), 16).astype(np.complex64)
    insp = make_inspector("ask", rate)
    insp.set_config({"ask.bits-per-symbol": 1, "ask.use-pll": False,
                     "agc.enabled": False, "clock.baud": baud,
                     "clock.type": 0, "clock.phase": 0.0, "mf.type": 0})
    out = insp.process(x[None, :])
    ids = np.asarray(out["symbols"])[0]
    assert len(ids) == 400
    assert np.mean(ids == bits) > 0.99


def test_set_config_rebuilds():
    insp = make_inspector("psk", 8000.0)
    assert insp.order == 2  # default bps=1
    insp.set_config({"afc.bits-per-symbol": 2})
    assert insp.order == 4
