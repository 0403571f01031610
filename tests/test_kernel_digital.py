"""FSK/ASK Pallas kernel (interpret mode)."""

import numpy as np

from sigdigger_tpu.kernels.digital import DigitalKernel, DigitalKernelConfig


def test_fsk_kernel_two_tone():
    cfg = DigitalKernelConfig(n_channels=8, block_len=512, mode="fsk",
                              sps=8.0, clock_gain=0.05, use_mf=False,
                              channel_tile=8)
    dk = DigitalKernel(cfg, interpret=True)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 512)
    freqs = (bits * 2 - 1) * 0.1 * np.pi
    phase = np.cumsum(np.repeat(freqs, 8))
    x = np.exp(1j * phase).astype(np.complex64)
    y = np.tile(x[:, None], (1, 8))
    softs, strobes = [], []
    for i in range(0, len(x), cfg.block_len):
        s, st = dk.feed(y[i:i + cfg.block_len])
        softs.append(s)
        strobes.append(st)
    soft = np.concatenate(softs, axis=0)[:, 0]
    stb = np.concatenate(strobes, axis=0)[:, 0]
    got = soft[stb]
    n = len(got)
    assert abs(n - 512) < 15
    tail = got[n // 2:]
    want = (bits * 2 - 1)[-n:][n // 2:len(got)]
    # decided tone signs match (allow global inversion ambiguity = none)
    decided = np.sign(tail)
    acc = np.mean(decided == want[:len(decided)])
    assert acc > 0.95, acc
    assert np.allclose(dk.period_estimate, 8.0, atol=0.2)


def test_ask_kernel_ook():
    cfg = DigitalKernelConfig(n_channels=8, block_len=512, mode="ask",
                              sps=8.0, clock_gain=0.05, use_mf=False,
                              channel_tile=8)
    dk = DigitalKernel(cfg, interpret=True)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 512)
    x = np.repeat(bits.astype(np.float32), 8).astype(np.complex64)
    y = np.tile(x[:, None], (1, 8))
    softs, strobes = [], []
    for i in range(0, len(x), cfg.block_len):
        s, st = dk.feed(y[i:i + cfg.block_len])
        softs.append(s)
        strobes.append(st)
    soft = np.concatenate(softs, axis=0)[:, 3]
    stb = np.concatenate(strobes, axis=0)[:, 3]
    got = soft[stb]
    n = len(got)
    tail = got[n // 2:]
    want = bits[-n:][n // 2:n // 2 + len(tail)]
    # DC-removed envelope: mark bits positive, space negative
    acc = np.mean((tail > 0).astype(int) == want[:len(tail)])
    assert acc > 0.9, acc


def test_digital_kernel_streaming_exact():
    cfg = DigitalKernelConfig(n_channels=8, block_len=256, mode="fsk",
                              sps=4.0, use_mf=True, channel_tile=8)
    dk1 = DigitalKernel(cfg, interpret=True)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64)
    y = np.tile(x[:, None], (1, 8))
    parts = [dk1.feed(y[i:i + 256])[0] for i in range(0, 1024, 256)]
    got = np.concatenate(parts, axis=0)

    cfg2 = DigitalKernelConfig(n_channels=8, block_len=1024, mode="fsk",
                               sps=4.0, use_mf=True, channel_tile=8)
    dk2 = DigitalKernel(cfg2, interpret=True)
    ref, _ = dk2.feed(y)
    assert np.allclose(got, ref, atol=1e-4)
