"""Batched PSK recovery on the unified bank kernel (interpret mode).

Originally written against the round-1 PskKernel; the receiver and the
analyzer now share ONE digital stack (kernels/recovery.py), so these
QPSK end-to-end and streaming-exactness properties pin that kernel.
"""

import numpy as np

from sigdigger_tpu.dsp.filters import fir_apply, rrc_taps
from sigdigger_tpu.kernels.recovery import (
    KIND_PSK,
    RecoveryBank,
    RecoveryBankConfig,
)


def make_qpsk(nsym, sps, f_off=0.0, seed=0):
    rng = np.random.default_rng(seed)
    syms = rng.integers(0, 4, nsym)
    const = np.exp(1j * (2 * np.pi * syms / 4))
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = const
    taps = rrc_taps(sps, span=8, rolloff=0.35)
    bb = np.array(fir_apply(up, taps))
    k = np.arange(len(bb))
    return (bb * np.exp(2j * np.pi * f_off * k)).astype(np.complex64), syms


def make_bank(block_len, sps=4.0, clock_gain=0.08):
    cfg = RecoveryBankConfig(n_channels=8, block_len=block_len,
                             channel_tile=8)
    bank = RecoveryBank(cfg, interpret=True)
    for c in range(8):
        bank.configure_channel(c, kind=KIND_PSK, sps=sps, order=4,
                               loop_bw=0.005, clock_gain=clock_gain)
    return bank


def test_psk_kernel_recovers_qpsk():
    bank = make_bank(512)
    nsym = 2048
    x, syms = make_qpsk(nsym, 4, f_off=0.002)
    y = np.tile(x[:, None], (1, 8))       # same signal on all channels
    all_sym = []
    all_strobe = []
    for i in range(0, nsym * 4, 512):
        s, st = bank.feed(y[i:i + 512])
        all_sym.append(s)
        all_strobe.append(st)
    sym = np.concatenate(all_sym, axis=0)
    strobe = np.concatenate(all_strobe, axis=0)
    # period locked near sps on every channel
    assert np.allclose(bank.period_estimate, 4.0, atol=0.1)
    for c in (0, 7):
        got = sym[:, c][strobe[:, c]]
        assert len(got) > nsym * 0.95
        tail = got[len(got) // 2:]
        conc = np.abs(np.mean(np.exp(1j * np.angle(tail ** 4))))
        assert conc > 0.9, conc


def test_psk_kernel_streaming_state():
    x, _ = make_qpsk(512, 4, seed=3)
    y = np.tile(x[:, None], (1, 8))[:1024]
    bank1 = make_bank(256)
    out1 = [bank1.feed(y[i:i + 256]) for i in range(0, 1024, 256)]
    sym1 = np.concatenate([o[0] for o in out1], axis=0)

    bank2 = make_bank(1024)
    sym2, _ = bank2.feed(y)
    # identical math: split vs one-shot must agree exactly
    assert np.allclose(sym1, sym2, atol=1e-4)
