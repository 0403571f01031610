#!/usr/bin/env python
"""Headline benchmark: Msamples/s/chip through FFT + channelize + demod.

Measures the flagship 1024-channel wideband FM receive chain — the
BASELINE.json primary metric — on the default JAX backend:

- TPU (axon): the fused Pallas kernels (Bailey four-step FFT PSD +
  matmul channelizer + discriminator + audio decimation), chained
  UNROLL blocks per dispatch with device-resident inputs so the
  remote-tunnel dispatch cost is amortized away from the kernel
  measurement.
- CPU fallback: the pure-JAX functional pipeline (same math).

Baseline: the reference is CPU-bound real-time at 3 Msps (it forces
decimation above that — reference include/AppConfig.h:38), so
vs_baseline = Msps / 3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MSPS = 3.0   # reference max real-time rate (AppConfig.h:38)


def bench_tpu() -> tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    from sigdigger_tpu.kernels.channelizer2 import (
        MatChannelizer2,
        MatChannelizer2Config,
    )
    from sigdigger_tpu.kernels.fft import PallasPSD, PallasPSDConfig
    from sigdigger_tpu.types import WindowFunction

    cfg = MatChannelizer2Config(
        sample_rate=102_400_000.0, n_channels=1024, taps=64,
        decimation=64, audio_taps=64, audio_decim=8, block_out=8192,
        m_tile=2048, channel_tile=128,
    )
    f0s = np.linspace(-48e6, 48e6, cfg.n_channels)
    mc = MatChannelizer2(cfg, f0s, bw=800e3, interpret=False)

    # frames_per_program = all frames: one PSD program per block measures
    # faster in-chain than a finer grid (less per-program scheduling)
    psd_cfg = PallasPSDConfig(fft_size=4096,
                              frames_per_block=cfg.block_in // 4096,
                              frames_per_program=cfg.block_in // 4096)
    psd = PallasPSD(psd_cfg, cfg.sample_rate,
                    WindowFunction.BLACKMANN_HARRIS, interpret=False)

    # the 2-D-tiled kernel runs the whole 524288-sample block in ONE
    # dispatch; unroll 2 amortizes the residual per-call cost (each
    # unrolled instance compiles separately via the remote toolchain)
    unroll = 2
    m_tiles = cfg.block_out // cfg.m_tile

    def chain(xw_res, xw_ims, fr_res, fr_ims, phi0, prev_re, prev_im,
              ftail):
        acc = None
        psd_acc = None
        for i in range(unroll):
            audio, prev_re, prev_im, ftail = mc.feed_device(
                xw_res[i], xw_ims[i], phi0, prev_re, prev_im, ftail)
            p = psd._call(fr_res[i], fr_ims[i], *psd._const)
            acc = audio if acc is None else acc + audio
            psd_acc = p if psd_acc is None else psd_acc + p
        return acc, psd_acc, prev_re, prev_im, ftail

    rng = np.random.default_rng(0)
    a, fb = psd_cfg.a, psd_cfg.frames_per_block
    xw_res = jnp.asarray(rng.standard_normal(
        (unroll, cfg.block_out, cfg.taps)).astype(np.float32))
    xw_ims = jnp.asarray(rng.standard_normal(
        (unroll, cfg.block_out, cfg.taps)).astype(np.float32))
    fr_res = jnp.asarray(rng.standard_normal(
        (unroll, a, fb * psd_cfg.b)).astype(np.float32))
    fr_ims = jnp.asarray(rng.standard_normal(
        (unroll, a, fb * psd_cfg.b)).astype(np.float32))
    phi0 = jnp.zeros((m_tiles * 8, cfg.n_channels), jnp.float32)
    prev = jnp.zeros((1, cfg.n_channels), jnp.float32)
    ftail = jnp.zeros((cfg.audio_taps - 1, cfg.n_channels), jnp.float32)

    cj = jax.jit(chain)
    r = cj(xw_res, xw_ims, fr_res, fr_ims, phi0, prev, prev, ftail)
    jax.block_until_ready(r)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        r = cj(xw_res, xw_ims, fr_res, fr_ims, phi0, r[2], r[3], r[4])
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / (iters * unroll)
    msps = cfg.block_in / dt / 1e6
    return msps, {"channels": cfg.n_channels,
                  "block_in": cfg.block_in,
                  "ms_per_block": dt * 1e3,
                  "path": "pallas-fused-v2"}


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
                  "ms_per_block": dt * 1e3, "path": "jax-pipeline"}


def main() -> None:
    import jax

    backend = jax.default_backend()
    try:
        if backend in ("tpu", "axon"):
            msps, extra = bench_tpu()
        else:
            msps, extra = bench_cpu()
    except Exception:  # noqa: BLE001 — fall back so bench always reports
        msps, extra = bench_cpu()
        extra["fallback"] = True
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
