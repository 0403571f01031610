"""CMA equalizer on the Pallas kernel path: equivalence with the
`lax.scan` reference implementation, lock semantics, and functional
equalization of a static ISI channel."""

from __future__ import annotations

import numpy as np
import pytest

from sigdigger_tpu.dsp.equalizer import CMAEqualizer
from sigdigger_tpu.kernels.equalizer import CMABank, CMABankConfig

C, T, K = 128, 256, 5


def _qpsk(channels, n, seed=0):
    rng = np.random.default_rng(seed)
    syms = (rng.integers(0, 4, (channels, n)) * 2 + 1) * np.pi / 4
    return np.exp(1j * syms).astype(np.complex64)


def test_kernel_matches_scan_reference():
    x = _qpsk(C, T)
    # mild static ISI so taps actually move
    isi = x + 0.25 * np.roll(x, 1, axis=1)
    bank = CMABank(CMABankConfig(C, T, n_taps=K), rate=2e-3)
    ref = CMAEqualizer(C, taps=K, rate=2e-3)
    for _ in range(3):                       # taps carry across blocks
        y_k = np.asarray(bank(isi))
        y_r = np.asarray(ref(isi))
        np.testing.assert_allclose(y_k, y_r, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(bank.taps_re).T + 1j * np.asarray(bank.taps_im).T,
        np.asarray(ref.taps), atol=2e-5)


def test_locked_taps_do_not_adapt():
    x = _qpsk(C, T, seed=1)
    bank = CMABank(CMABankConfig(C, T, n_taps=K), rate=5e-3, locked=True)
    t0_re = np.asarray(bank.taps_re).copy()
    bank(x + 0.4 * np.roll(x, 1, axis=1))
    np.testing.assert_array_equal(np.asarray(bank.taps_re), t0_re)
    assert np.all(np.asarray(bank.taps_im) == 0.0)


def test_kernel_cma_equalizes_isi_channel():
    """After adaptation, symbol modulus error shrinks vs the distorted
    input (the same bar as test_extras::test_cma_equalizes_static_channel,
    on the kernel path)."""
    x = _qpsk(C, 512, seed=2)
    isi = x + 0.3 * np.roll(x, 1, axis=1) - 0.1j * np.roll(x, 2, axis=1)
    bank = CMABank(CMABankConfig(C, 512, n_taps=K), rate=3e-3)
    y = None
    for _ in range(8):
        y = np.asarray(bank(isi))
    evm_in = np.abs(np.abs(isi[:, 64:]) - 1.0).mean()
    evm_out = np.abs(np.abs(y[:, 64:]) - 1.0).mean()
    assert evm_out < 0.5 * evm_in, (evm_in, evm_out)


def test_per_channel_rate_rows():
    rates = np.full(C, 2e-3, np.float32)
    rates[: C // 2] = 0.0                    # half the bank frozen
    x = _qpsk(C, T, seed=3)
    bank = CMABank(CMABankConfig(C, T, n_taps=K), rate=rates)
    bank(x + 0.3 * np.roll(x, 1, axis=1))
    tr = np.asarray(bank.taps_re)
    moved = np.abs(tr[0, :]) > 1e-9          # first tap adapted?
    assert not moved[: C // 2].any()
    assert moved[C // 2:].any()
