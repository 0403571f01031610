"""RawBank + RecoveryBank kernels (interpret mode).

The TPU-path analyzer's channel machinery: per-channel raw extraction
and the unified PSK/FSK/ASK recovery bank with per-channel kind, order,
baud and loop parameters (reference inspector classes
Default/Inspection/InspToolWidget.cpp:932-950)."""

import numpy as np

from sigdigger_tpu.dsp.filters import fir_apply, rrc_taps
from sigdigger_tpu.kernels.rawbank import RawBank, RawBankConfig
from sigdigger_tpu.kernels.recovery import (
    KIND_ASK,
    KIND_FSK,
    KIND_PSK,
    RecoveryBank,
    RecoveryBankConfig,
)

FS = 256_000.0


def make_raw(**kw) -> RawBank:
    cfg = RawBankConfig(sample_rate=FS, n_channels=128, taps=64,
                        decimation=16, block_out=512, m_tile=256,
                        channel_tile=128, **kw)
    return RawBank(cfg, interpret=True)


def make_psk(nsym, sps, order=4, f_off=0.0, seed=0):
    rng = np.random.default_rng(seed)
    syms = rng.integers(0, order, nsym)
    const = np.exp(1j * (2 * np.pi * syms / order))
    n = int(round(nsym * sps))
    up = np.zeros(n, np.complex64)
    pos = np.round(np.arange(nsym) * sps).astype(int)
    up[pos[pos < n]] = const[pos < n]
    taps = rrc_taps(sps, span=6, rolloff=0.35)
    bb = np.array(fir_apply(up, taps))
    k = np.arange(len(bb))
    return (bb * np.exp(2j * np.pi * f_off * k)).astype(np.complex64), syms


# ---------------------------------------------------------------------------
# RawBank
# ---------------------------------------------------------------------------

def test_rawbank_extracts_tone():
    bank = make_raw()
    f0, off = 60e3, 200.0
    bank.configure_channel(0, f0=f0, bw=2e3)
    bank.configure_channel(1, f0=-40e3, bw=2e3)
    n = bank.cfg.block_in * 8
    t = np.arange(n) / FS
    x = (0.8 * np.exp(2j * np.pi * (f0 + off) * t)
         + 0.5 * np.exp(2j * np.pi * -40e3 * t)).astype(np.complex64)
    outs = [bank.feed(x[i:i + bank.cfg.block_in])
            for i in range(0, n, bank.cfg.block_in)]
    y = np.concatenate([o[0] + 1j * o[1] for o in outs], axis=0)
    # channel 0: 0.8-amplitude tone at +200 Hz relative
    z = y[512:, 0]
    assert abs(np.mean(np.abs(z)) - 0.8) < 0.05
    dphi = np.angle(z[1:] * np.conj(z[:-1]))
    f_meas = np.mean(dphi) / (2 * np.pi) * bank.cfg.channel_rate
    assert abs(f_meas - off) < 5.0
    # channel 1: DC tone of amplitude 0.5
    z1 = y[512:, 1]
    assert abs(np.mean(np.abs(z1)) - 0.5) < 0.05
    assert abs(np.angle(np.mean(z1[1:] * np.conj(z1[:-1])))) < 1e-3
    # block power reports per-channel mean |y|^2
    assert abs(bank.block_power[0] - 0.64) < 0.05
    assert abs(bank.block_power[1] - 0.25) < 0.05


def test_rawbank_retune_no_recompile():
    bank = make_raw()
    call = bank._call
    bank.configure_channel(3, f0=10e3, bw=1e3)
    bank.configure_channel(3, f0=-10e3)
    assert bank._call is call


# ---------------------------------------------------------------------------
# RecoveryBank
# ---------------------------------------------------------------------------

def test_recovery_mixed_kinds_per_channel():
    """One bank, three kinds at once: QPSK @ sps 4, BPSK @ sps 8 (a
    different baud), FSK and ASK — each on its own channel with its own
    per-channel configuration."""
    cfg = RecoveryBankConfig(n_channels=128, block_len=512,
                             mf_taps_max=64, channel_tile=128)
    bank = RecoveryBank(cfg, interpret=True)
    bank.configure_channel(0, kind=KIND_PSK, sps=4.0, order=4,
                           loop_bw=0.005, clock_gain=0.08)
    bank.configure_channel(1, kind=KIND_PSK, sps=8.0, order=2,
                           loop_bw=0.005, clock_gain=0.08)
    bank.configure_channel(2, kind=KIND_FSK, sps=8.0, clock_gain=0.08,
                           use_mf=False)
    bank.configure_channel(3, kind=KIND_ASK, sps=8.0, clock_gain=0.08,
                           use_mf=False)

    n = 8192
    rng = np.random.default_rng(5)
    y = np.zeros((n, 128), np.complex64)

    qpsk, _ = make_psk(n // 4, 4.0, order=4, f_off=0.002, seed=1)
    y[:, 0] = qpsk[:n]
    bpsk, _ = make_psk(n // 8, 8.0, order=2, f_off=-0.001, seed=2)
    y[:len(bpsk), 1] = bpsk[:n]
    # FSK: ±0.1π rad/sample frequency steps, 8 sps
    bits_f = rng.integers(0, 2, n // 8)
    inst = (2 * bits_f - 1).repeat(8) * 0.1 * np.pi
    y[:, 2] = np.exp(1j * np.cumsum(inst))[:n]
    # ASK: OOK-ish 2-level envelope
    bits_a = rng.integers(0, 2, n // 8)
    y[:, 3] = (0.4 + 0.6 * bits_a).repeat(8)[:n]

    sym, strobe = [], []
    for i in range(0, n, cfg.block_len):
        s, st = bank.feed(y[i:i + cfg.block_len])
        sym.append(s)
        strobe.append(st)
    sym = np.concatenate(sym, axis=0)
    strobe = np.concatenate(strobe, axis=0)

    # QPSK: carrier locked, 4th-power concentration high
    got = sym[:, 0][strobe[:, 0]]
    assert len(got) > 0.9 * (n / 4)
    tail = got[len(got) // 2:]
    assert np.abs(np.mean(np.exp(1j * np.angle(tail ** 4)))) > 0.9
    assert abs(bank.period_estimate[0] - 4.0) < 0.2

    # BPSK at sps 8: 2nd-power concentration
    got = sym[:, 1][strobe[:, 1]]
    tail = got[len(got) // 2:]
    assert np.abs(np.mean(np.exp(1j * np.angle(tail ** 2)))) > 0.9
    assert abs(bank.period_estimate[1] - 8.0) < 0.4

    # FSK: soft values bimodal at ±0.1 (discriminator gain 1/π)
    got = np.real(sym[:, 2][strobe[:, 2]])
    tail = got[len(got) // 2:]
    assert np.mean(np.abs(np.abs(tail) - 0.1) < 0.03) > 0.9

    # ASK: bimodal envelope around ±0.3 after DC removal
    got = np.real(sym[:, 3][strobe[:, 3]])
    tail = got[len(got) // 2:]
    assert np.std(np.abs(tail)) < np.std(tail)  # two-sided
    # untouched channel stays silent-ish (zeros in → zeros out)
    assert np.all(np.abs(sym[:, 64]) < 1e-3)


def test_recovery_streaming_state():
    cfg1 = RecoveryBankConfig(n_channels=8, block_len=256,
                              channel_tile=8)
    b1 = RecoveryBank(cfg1, interpret=True)
    cfg2 = RecoveryBankConfig(n_channels=8, block_len=1024,
                              channel_tile=8)
    b2 = RecoveryBank(cfg2, interpret=True)
    for b in (b1, b2):
        for c in range(8):
            b.configure_channel(c, kind=KIND_PSK, sps=4.0, order=4)
    x, _ = make_psk(512, 4.0, seed=3)
    y = np.tile(x[:1024, None], (1, 8)).astype(np.complex64)
    sym1 = np.concatenate(
        [b1.feed(y[i:i + 256])[0] for i in range(0, 1024, 256)], axis=0)
    sym2, _ = b2.feed(y)
    np.testing.assert_allclose(sym1, sym2, atol=1e-4)


def test_recovery_reconfigure_no_recompile():
    cfg = RecoveryBankConfig(n_channels=8, block_len=256, channel_tile=8)
    bank = RecoveryBank(cfg, interpret=True)
    call = bank._call
    bank.configure_channel(0, kind=KIND_FSK, sps=6.0)
    bank.configure_channel(0, kind=KIND_PSK, order=8, sps=3.0)
    assert bank._call is call
