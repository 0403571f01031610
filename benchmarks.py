#!/usr/bin/env python
"""Extended benchmark configurations (BASELINE.json `configs`).

`bench.py` prints the single headline line the driver records; this
script runs the broader matrix on whatever backend is active:

  wbfm       WBFM broadcast demod (headline config, PR1)
  am         AM/SSB voice channel chain
  fsk        FSK burst decode chain (quad + clock recovery)
  qpsk       QPSK inspector chain (Costas + RRC + Gardner)
  panoramic  1024-channel polyphase channelizer throughput
  all        everything, one JSON line each

Usage: python benchmarks.py [config ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timeit(step, args, iters=10, warmup=1):
    import jax

    for _ in range(warmup):
        out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_wbfm():
    import subprocess

    out = subprocess.run([sys.executable, "bench.py"],
                         capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    print(line)


def _xla_backend_ok(name) -> bool:
    """The pure-JAX pipeline needs full XLA (complex FFT/scan), which
    the axon TPU toolchain does not lower — run these on CPU."""
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        print(json.dumps({"metric": name, "skipped": True,
                          "reason": "pure-JAX config; run on CPU "
                                    "(TPU path is bench.py)"}))
        return False
    return True


def _pipeline_bench(name, demod, n_channels=256, n_sub=64, extra=None):
    import jax

    if not _xla_backend_ok(f"{name}_throughput"):
        return

    from sigdigger_tpu.pipeline import (
        PipelineConfig,
        init_state,
        jit_pipeline,
        make_constants,
    )

    kw = dict(sample_rate=8_192_000.0, fft_size=2048,
              n_channels=n_channels, n_sub=n_sub, demod=demod)
    kw.update(extra or {})
    cfg = PipelineConfig(**kw)
    consts = make_constants(
        cfg, np.linspace(-3.5e6, 3.5e6, cfg.n_channels),
        np.full(cfg.n_channels, 40e3))
    state = init_state(cfg)
    step = jit_pipeline(cfg)
    rng = np.random.default_rng(0)
    block = 1 << 17
    x = (rng.standard_normal(block) + 1j * rng.standard_normal(block)
         ).astype(np.complex64)

    def run(s, xx):
        s, out = step(consts, s, xx)
        return out

    dt = _timeit(run, (state, x))
    msps = block / dt / 1e6
    print(json.dumps({
        "metric": f"{name}_throughput", "value": round(msps, 2),
        "unit": "Msamples/s", "vs_baseline": round(msps / 3.0, 2),
        "channels": cfg.n_channels, "backend": jax.default_backend(),
    }))


def bench_am():
    _pipeline_bench("am_voice", "am")


def bench_qpsk():
    _pipeline_bench("qpsk_inspector", "psk",
                    extra={"sps": 4.0, "psk_order": 4})


def bench_fsk():
    """FSK chain = quad demod + clock recovery over the channelized
    stream (inspector path on CPU; TPU runs the fused kernels)."""
    import jax

    from sigdigger_tpu.inspectors import make_inspector

    if not _xla_backend_ok("fsk_chain_throughput"):
        return
    rate = 64_000.0
    insp = make_inspector("fsk", rate, channels=64)
    insp.set_config({"clock.baud": 4000.0, "clock.type": 1,
                     "mf.type": 0})
    rng = np.random.default_rng(0)
    block = 1 << 14
    x = (rng.standard_normal((64, block)) +
         1j * rng.standard_normal((64, block))).astype(np.complex64)

    def run(xx):
        return insp.process(xx)["samples"]

    dt = _timeit(run, (x,), iters=5)
    msps = 64 * block / dt / 1e6
    print(json.dumps({
        "metric": "fsk_chain_throughput", "value": round(msps, 2),
        "unit": "Mchan-samples/s", "vs_baseline": round(msps / 3.0, 2),
        "channels": 64, "backend": jax.default_backend(),
    }))


def bench_panoramic():
    """1024-channel channelizer (extraction only, no demod)."""
    import jax

    from sigdigger_tpu.pipeline import (
        PipelineConfig,
        init_state,
        jit_pipeline,
        make_constants,
    )

    if not _xla_backend_ok("panoramic_1024ch_channelize"):
        return
    cfg = PipelineConfig(sample_rate=102_400_000.0, fft_size=4096,
                         n_channels=1024, n_sub=64, demod="raw")
    consts = make_constants(
        cfg, np.linspace(-50e6, 50e6, 1024), np.full(1024, 800e3))
    state = init_state(cfg)
    step = jit_pipeline(cfg)
    rng = np.random.default_rng(0)
    block = 1 << 18
    x = (rng.standard_normal(block) + 1j * rng.standard_normal(block)
         ).astype(np.complex64)

    def run(s, xx):
        s, out = step(consts, s, xx)
        return out["iq"]

    dt = _timeit(run, (state, x), iters=5)
    msps = block / dt / 1e6
    print(json.dumps({
        "metric": "panoramic_1024ch_channelize", "value": round(msps, 2),
        "unit": "Msamples/s", "vs_baseline": round(msps / 3.0, 2),
        "channels": 1024, "backend": jax.default_backend(),
    }))


CONFIGS = {
    "wbfm": bench_wbfm,
    "am": bench_am,
    "fsk": bench_fsk,
    "qpsk": bench_qpsk,
    "panoramic": bench_panoramic,
}


def main(argv):
    names = argv or ["all"]
    if names == ["all"]:
        names = list(CONFIGS)
    for n in names:
        CONFIGS[n]()


if __name__ == "__main__":
    main(sys.argv[1:])
