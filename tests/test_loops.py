"""Recurrent-loop DSP: AGC, PLL/Costas, Gardner clock recovery."""

import numpy as np

from sigdigger_tpu.dsp import AGC, PLL, AGCParams, CostasLoop, GardnerClock
from sigdigger_tpu.dsp.decider import decide_phase
from sigdigger_tpu.dsp.filters import fir_apply, rrc_taps


def tone(n, f_norm, amp=1.0, phase0=0.0):
    k = np.arange(n)
    return (amp * np.exp(1j * (2 * np.pi * f_norm * k + phase0))).astype(
        np.complex64
    )


def test_agc_normalizes_amplitude():
    agc = AGC(channels=2, params=AGCParams(tau=50.0))
    x = np.stack([tone(8000, 0.01, amp=0.05), tone(8000, 0.02, amp=20.0)])
    y = np.asarray(agc(x))
    # after convergence both channels near unit amplitude
    settled = np.abs(y[:, 4000:])
    assert np.allclose(settled.mean(axis=1), 1.0, rtol=0.2)


def test_agc_streaming_equals_oneshot():
    x = np.stack([tone(4096, 0.01, amp=3.0)])
    a1 = AGC(1, AGCParams(tau=30.0))
    ref = np.asarray(a1(x))
    a2 = AGC(1, AGCParams(tau=30.0))
    got = np.concatenate(
        [np.asarray(a2(x[:, :2048])), np.asarray(a2(x[:, 2048:]))], axis=1
    )
    assert np.allclose(got, ref, atol=1e-5)


def test_agc_tracks_fade():
    agc = AGC(1, AGCParams(tau=20.0))
    x = np.concatenate([tone(4000, 0.01, amp=1.0),
                        tone(4000, 0.01, amp=0.1)])[None, :]
    y = np.asarray(agc(x))
    assert np.isclose(np.abs(y[0, 3000:3900]).mean(), 1.0, rtol=0.15)
    assert np.isclose(np.abs(y[0, 7000:]).mean(), 1.0, rtol=0.3)


def test_pll_locks_to_carrier():
    f_off = 0.003
    x = tone(20000, f_off, phase0=1.0)[None, :]
    pll = PLL(1, loop_bw=0.02)
    y = np.asarray(pll(x))
    # after lock the output phase is ~constant (carrier removed)
    locked = y[0, 15000:]
    dph = np.angle(locked[1:] * np.conj(locked[:-1]))
    assert np.abs(dph).max() < 0.01
    # tracked frequency matches
    freq = float(np.asarray(pll.frequency_estimate)[0])
    assert np.isclose(freq, 2 * np.pi * f_off, rtol=0.05)


def test_costas_qpsk_locks_and_recovers_symbols():
    rng = np.random.default_rng(11)
    nsym = 4000
    sps = 4
    f_off = 0.002
    syms = rng.integers(0, 4, nsym)
    const = np.exp(1j * (2 * np.pi * syms / 4 + np.pi / 4))
    bb = np.repeat(const, sps)  # rectangular pulses
    k = np.arange(len(bb))
    x = (bb * np.exp(2j * np.pi * f_off * k)).astype(np.complex64)[None, :]
    loop = CostasLoop(1, loop_bw=0.01, order=4)
    y = np.asarray(loop(x))[0]
    # steady state: constellation de-rotated → symbol phases near the
    # QPSK points modulo constant rotation ambiguity
    tail = y[len(y) // 2:]
    ang = np.angle(tail ** 4)  # 4th power collapses QPSK points
    spread = np.std(np.unwrap(ang))
    assert spread < 0.3
    freq = float(np.asarray(loop.frequency_estimate)[0])
    assert np.isclose(freq, 2 * np.pi * f_off, rtol=0.1)


def test_costas_bpsk():
    rng = np.random.default_rng(5)
    syms = rng.integers(0, 2, 2000) * 2 - 1
    bb = np.repeat(syms.astype(np.complex64), 8)
    k = np.arange(len(bb))
    x = (bb * np.exp(2j * np.pi * 0.001 * k)).astype(np.complex64)[None, :]
    loop = CostasLoop(1, loop_bw=0.01, order=2)
    y = np.asarray(loop(x))[0]
    tail = y[len(y) // 2:]
    # BPSK after lock: energy concentrated on the real axis
    assert np.mean(np.abs(tail.real)) > 5 * np.mean(np.abs(tail.imag))


def test_gardner_locks_and_samples_qpsk():
    rng = np.random.default_rng(3)
    nsym = 3000
    sps = 8
    syms = rng.integers(0, 4, nsym)
    const = np.exp(1j * (2 * np.pi * syms / 4 + np.pi / 4)).astype(
        np.complex64
    )
    # RRC-shaped baseband with a fractional timing offset
    taps = rrc_taps(sps, span=8, rolloff=0.35)
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = const
    bb = np.asarray(fir_apply(up, taps))
    mf = np.array(fir_apply(bb, taps))  # matched filter
    mf = mf / np.abs(mf).max()
    x = mf[3:][None, :]  # timing offset of 3 samples

    clk = GardnerClock(1, sps=sps, gain=0.1)
    sym, strobe = clk(x)
    sym = np.asarray(sym)[0]
    strobe = np.asarray(strobe)[0]
    got = sym[strobe]
    # symbol rate correct within 2%
    assert abs(len(got) - (len(x[0]) / sps)) < 0.02 * len(x[0]) / sps
    # decided symbols in steady state form 4 tight clusters
    tail = got[len(got) // 2:]
    ids = np.asarray(decide_phase(tail, 2))
    centers = np.array(
        [np.angle(np.mean(tail[ids == i] ** 4)) for i in range(4)]
    )
    # cluster tightness: per-symbol 4th-power angle concentrated
    resid = np.abs(np.angle(tail ** 4 * np.exp(-1j * centers[ids])))
    assert np.median(resid) < 0.3


def test_gardner_streaming_consistency():
    rng = np.random.default_rng(9)
    sps = 6
    syms = (rng.integers(0, 2, 600) * 2 - 1).astype(np.complex64)
    x = np.repeat(syms, sps)[None, :]
    c1 = GardnerClock(1, sps=sps, gain=0.05)
    s_ref, st_ref = c1(x)
    ref = np.asarray(s_ref)[0][np.asarray(st_ref)[0]]
    c2 = GardnerClock(1, sps=sps, gain=0.05)
    parts = []
    half = x.shape[1] // 2
    for blk in (x[:, :half], x[:, half:]):
        s, st = c2(blk)
        parts.append(np.asarray(s)[0][np.asarray(st)[0]])
    got = np.concatenate(parts)
    assert len(got) == len(ref)
    assert np.allclose(got, ref, atol=1e-5)
