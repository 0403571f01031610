#!/usr/bin/env python
"""Measure the axon tunnel's raw transfer characteristics.

Prints incremental `key value` lines then one final JSON line with:
- rtt_ms: median round-trip of a tiny dispatch+fetch (dispatch floor)
- h2d_mbps / d2h_mbps: sustained bandwidth for 1 and 4 MB payloads,
  DISTINCT random content each rep (the tunnel dedupes repeated bytes)
- h2d_mbps_zeros: compressible-content upload (does the link compress?)
- duplex_mbps: combined rate with uploads and fetches interleaved

These numbers are the denominator for every end-to-end claim in
bench.py: bytes_per_block / bandwidth is the floor no kernel speedup
can beat.  Kept small (~60 MB total) — the tunnel is slow.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def med(fn, reps=3, warm=0):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def say(k, v):
    print(f"{k} {v}", flush=True)


def main():
    import jax

    backend = jax.default_backend()
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    out = {"backend": backend}

    small = [rng.standard_normal(8).astype(np.float32)
             for _ in range(64)]
    it = iter(small * 100)
    rtt = med(lambda: np.asarray(jax.device_put(next(it), dev)),
              reps=15, warm=2)
    out["rtt_ms"] = round(rtt * 1e3, 2)
    say("rtt_ms", out["rtt_ms"])

    import jax.numpy as jnp

    # fresh device-produced arrays per fetch — np.asarray on an
    # uploaded array returns the cached host copy (measured 250 GB/s
    # "fetches" before this fix)
    scale = jax.jit(lambda x, s: x * s)

    for mb in (1, 4):
        n = mb * (1 << 20) // 4
        bufs = [rng.standard_normal(n).astype(np.float32)
                for _ in range(3)]

        def h2d():
            jax.block_until_ready([jax.device_put(b, dev)
                                   for b in bufs])

        t = med(h2d, reps=2, warm=1)
        out[f"h2d_mbps_{mb}mb"] = round(len(bufs) * mb / t, 2)
        say(f"h2d_mbps_{mb}mb", out[f"h2d_mbps_{mb}mb"])

        hs = [jax.device_put(b, dev) for b in bufs]
        jax.block_until_ready(hs)
        k = iter(range(1, 1000))

        def d2h():
            fresh = [scale(h, jnp.float32(1.0 + 1e-6 * next(k)))
                     for h in hs]
            jax.block_until_ready(fresh)
            t0 = time.perf_counter()
            for f in fresh:
                np.asarray(f)
            return time.perf_counter() - t0

        ts = [d2h() for _ in range(3)]
        t = float(np.median(ts))
        out[f"d2h_mbps_{mb}mb"] = round(len(bufs) * mb / t, 2)
        say(f"d2h_mbps_{mb}mb", out[f"d2h_mbps_{mb}mb"])

    # compressible-content probe (constant bytes, distinct objects)
    def h2d_zero():
        z = np.zeros((1 << 20,), np.float32)
        z[0] = time.perf_counter()      # distinct object, ~all zeros
        jax.block_until_ready(jax.device_put(z, dev))

    t = med(h2d_zero, reps=3, warm=1)
    out["h2d_mbps_zeros_4mb"] = round(4 / t, 2)
    say("h2d_mbps_zeros_4mb", out["h2d_mbps_zeros_4mb"])

    # int16 payload (the engine's upload dtype)
    n = 2 * (1 << 20)
    bufs16 = [rng.integers(-32000, 32000, n).astype(np.int16)
              for _ in range(3)]

    def h2d16():
        jax.block_until_ready([jax.device_put(b, dev) for b in bufs16])

    t = med(h2d16, reps=2, warm=1)
    out["h2d_mbps_i16_4mb"] = round(len(bufs16) * 4 / t, 2)
    say("h2d_mbps_i16_4mb", out["h2d_mbps_i16_4mb"])

    # duplex: upload new blocks while fetching freshly-computed ones
    big = [rng.standard_normal((1 << 20,)).astype(np.float32)
           for _ in range(10)]
    hs = [jax.device_put(b, dev) for b in big[:2]]
    jax.block_until_ready(hs)
    k2 = iter(range(1, 1000))
    up_it = iter(big[2:])          # distinct content per rep (dedupe)

    def duplex():
        fresh = [scale(h, jnp.float32(1.0 + 1e-6 * next(k2)))
                 for h in hs]
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        pend = [jax.device_put(next(up_it), dev) for _ in range(2)]
        for f in fresh:
            np.asarray(f)
        jax.block_until_ready(pend)
        return time.perf_counter() - t0

    ts = [duplex() for _ in range(3)]
    t = float(np.median(ts))
    out["duplex_mbps_16mb_total"] = round(16 / t, 2)
    say("duplex_mbps_16mb_total", out["duplex_mbps_16mb_total"])

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
