"""FSK/ASK recovery on the unified bank kernel (interpret mode).

Originally written against the round-1 DigitalKernel; the receiver and
the analyzer now share ONE digital stack (kernels/recovery.py)."""

import numpy as np

from sigdigger_tpu.kernels.recovery import (
    KIND_ASK,
    KIND_FSK,
    RecoveryBank,
    RecoveryBankConfig,
)


def make_bank(block_len, kind, sps=8.0, use_mf=False,
              clock_gain=0.05):
    cfg = RecoveryBankConfig(n_channels=8, block_len=block_len,
                             channel_tile=8)
    bank = RecoveryBank(cfg, interpret=True)
    for c in range(8):
        bank.configure_channel(c, kind=kind, sps=sps,
                               clock_gain=clock_gain, use_mf=use_mf)
    return bank


def test_fsk_kernel_two_tone():
    bank = make_bank(512, KIND_FSK)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 512)
    freqs = (bits * 2 - 1) * 0.1 * np.pi
    phase = np.cumsum(np.repeat(freqs, 8))
    x = np.exp(1j * phase).astype(np.complex64)
    y = np.tile(x[:, None], (1, 8))
    softs, strobes = [], []
    for i in range(0, len(x), 512):
        s, st = bank.feed(y[i:i + 512])
        softs.append(s)
        strobes.append(st)
    soft = np.concatenate(softs, axis=0)[:, 0]
    stb = np.concatenate(strobes, axis=0)[:, 0]
    got = np.real(soft[stb])
    n = len(got)
    assert abs(n - 512) < 15
    tail = got[n // 2:]
    want = (bits * 2 - 1)[-n:][n // 2:n // 2 + len(tail)]
    decided = np.sign(tail)
    acc = np.mean(decided == want[:len(decided)])
    assert acc > 0.95, acc
    assert np.allclose(bank.period_estimate, 8.0, atol=0.2)


def test_ask_kernel_ook():
    bank = make_bank(512, KIND_ASK)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 512)
    x = np.repeat(bits.astype(np.float32), 8).astype(np.complex64)
    y = np.tile(x[:, None], (1, 8))
    softs, strobes = [], []
    for i in range(0, len(x), 512):
        s, st = bank.feed(y[i:i + 512])
        softs.append(s)
        strobes.append(st)
    soft = np.concatenate(softs, axis=0)[:, 3]
    stb = np.concatenate(strobes, axis=0)[:, 3]
    got = np.real(soft[stb])
    n = len(got)
    tail = got[n // 2:]
    want = bits[-n:][n // 2:n // 2 + len(tail)]
    # DC-removed envelope: mark bits positive, space negative
    acc = np.mean((tail > 0).astype(int) == want[:len(tail)])
    assert acc > 0.9, acc


def test_digital_kernel_streaming_exact():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64)
    y = np.tile(x[:, None], (1, 8))
    bank1 = make_bank(256, KIND_FSK, sps=4.0, use_mf=True)
    parts = [bank1.feed(y[i:i + 256])[0] for i in range(0, 1024, 256)]
    got = np.concatenate(parts, axis=0)

    bank2 = make_bank(1024, KIND_FSK, sps=4.0, use_mf=True)
    ref, _ = bank2.feed(y)
    assert np.allclose(got, ref, atol=1e-4)
