#!/usr/bin/env python
"""TPU smoke test: panoramic sweep with the Pallas spectrum path.

Proves the Scanner's hot path (hop PSD via the Bailey DFT-matmul
kernel + device rebin matmul) executes on the real axon TPU — the r3
VERDICT found the jnp.fft-based estimator cannot run there.

Runs a 16-hop progressive sweep of a synthetic 10 MHz band with three
emitters and asserts the stitched 65536-bin spectrum finds them.
Prints one JSON line; non-zero exit on failure.  Output committed as
scripts/tpu_sweep_smoke.out.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sigdigger_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()


def main() -> int:
    import jax

    backend = jax.default_backend()
    from sigdigger_tpu.analyzer.sweep import Scanner
    from sigdigger_tpu.kernels.fft import PallasPSD
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.sources.synth import Emitter, SynthBandSource
    from sigdigger_tpu.types import SweepStrategy

    prof = SourceProfile(type="synth", sample_rate=2_048_000,
                         noise_db=-60.0)
    emitters = [Emitter(freq=101.0e6, amplitude=1.0),
                Emitter(freq=105.5e6, amplitude=0.5),
                Emitter(freq=108.9e6, amplitude=0.8)]
    src = SynthBandSource(prof, emitters)

    sc = Scanner(src, 100e6, 110e6,
                 strategy=SweepStrategy.PROGRESSIVE,
                 resolution_hz=4000.0, seed=42, estimator="pallas")
    assert isinstance(sc._est, PallasPSD), sc._est
    assert not sc._est.interpret, "must compile on the TPU backend"

    t0 = time.perf_counter()
    psd = sc.sweep(hops=16)
    dt = time.perf_counter() - t0

    freqs = sc.view.frequencies()
    floor = float(np.median(psd))
    found = {}
    for f_em in (101.0e6, 105.5e6, 108.9e6):
        i = int(np.argmin(np.abs(freqs - f_em)))
        window = psd[max(0, i - 8):i + 8]
        found[f"{f_em/1e6:.1f}MHz"] = round(
            float(window.max() / max(floor, 1e-30)), 1)
    ok = all(v > 50.0 for v in found.values())
    print(json.dumps({
        "backend": backend, "estimator": "pallas",
        "fft_size": sc.fft_size, "hops": sc.hops_done,
        "sweep_s": round(dt, 2),
        "coverage": round(float(sc.view.coverage()), 3),
        "peak_over_floor": found, "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
