#!/usr/bin/env python
"""Per-stage breakdown of the benched end-to-end and engine paths.

Runs the bench.py flagship config synchronously, timing each stage
separately (median of N), with byte counts, so "where do the
milliseconds go" is measured instead of asserted:

  e2e (KernelReceiver, fm):
    frame_ms    host framing (native packing, complex64 -> int16 [2M,K])
    h2d_ms      device_put of the packed buffer (+bytes)
    kernel_ms   chained PSD + channelizer dispatches, input resident
    d2h_ms      audio + PSD fetch (+bytes)

  engine (KernelAnalyzer, 8 audio + 8 psk + 1 power):
    per-stage via engine hooks (frame/upload/dispatch/fetch/demap)

Prints one JSON line.
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

SAMPLE_RATE = 102_400_000.0
N_CHANNELS = 1024
BLOCK_OUT = 8192
PSD_FFT = 4096


def med(vals):
    return float(np.median(vals))


def profile_e2e(iters=8):
    import jax

    from sigdigger_tpu.receiver import KernelReceiver

    rx = KernelReceiver(
        sample_rate=SAMPLE_RATE,
        f0s=np.linspace(-48e6, 48e6, N_CHANNELS), bw=800e3,
        mode="fm", decimation=64, block_out=BLOCK_OUT,
        psd_fft=PSD_FFT, interpret=False, in_i16=True, audio_bf16=True,
    )
    rng = np.random.default_rng(0)
    blocks = [(rng.standard_normal(rx.block_in)
               + 1j * rng.standard_normal(rx.block_in)
               ).astype(np.complex64) for _ in range(iters + 1)]
    rx.feed(blocks[0])                       # warm/compile

    t_frame, t_h2d, t_kern, t_d2h = [], [], [], []
    up_bytes = dn_bytes = 0
    for x in blocks[1:]:
        t0 = time.perf_counter()
        xw = rx._chan._frame(x)
        t1 = time.perf_counter()
        xw_dev = jax.device_put(xw)
        jax.block_until_ready(xw_dev)
        t2 = time.perf_counter()
        psd_h = rx._psd.feed_async(xw_dev)
        audio = rx._chan.feed_packed(xw_dev)
        jax.block_until_ready((psd_h, audio))
        t3 = time.perf_counter()
        a = np.asarray(audio)
        p = np.asarray(psd_h)
        rx._psd.fold(p)
        t4 = time.perf_counter()
        t_frame.append(t1 - t0)
        t_h2d.append(t2 - t1)
        t_kern.append(t3 - t2)
        t_d2h.append(t4 - t3)
        up_bytes = xw.nbytes
        dn_bytes = (a.nbytes if a.dtype != np.dtype("V2")
                    else a.size * 2) + p.nbytes
    audio_np = np.asarray(audio)
    return {
        "e2e_frame_ms": round(med(t_frame) * 1e3, 2),
        "e2e_h2d_ms": round(med(t_h2d) * 1e3, 2),
        "e2e_kernel_ms": round(med(t_kern) * 1e3, 2),
        "e2e_d2h_ms": round(med(t_d2h) * 1e3, 2),
        "e2e_h2d_bytes": up_bytes,
        "e2e_d2h_bytes": dn_bytes,
        "e2e_audio_shape": list(audio_np.shape),
        "e2e_audio_dtype": str(audio_np.dtype),
    }


def profile_engine(iters=6):
    import jax

    from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.sources.base import SignalSource
    from sigdigger_tpu.types import AnalyzerParams, Channel

    block = BLOCK_OUT * 64
    rng = np.random.default_rng(1)
    blocks = [(rng.standard_normal(block)
               + 1j * rng.standard_normal(block)).astype(np.complex64)
              for _ in range(iters + 2)]

    class RingSource(SignalSource):
        def __init__(self, profile, blocks):
            super().__init__(profile)
            self._blocks = blocks
            self._i = 0

        def _read_impl(self, n):
            b = self._blocks[self._i % len(self._blocks)]
            self._i += 1
            return b

    prof = SourceProfile(type="synth", sample_rate=int(SAMPLE_RATE))
    src = RingSource(prof, blocks)
    params = AnalyzerParams()
    params.window_size = PSD_FFT
    an = KernelAnalyzer(source=src, params=params, block_size=block,
                        n_slots=128, decimation=64, audio_decim=8,
                        interpret=False, pipeline_depth=1)
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
    an.step()
    an.poll()

    # instrument one synchronous _compute_block by hand
    t_frame, t_h2d, t_disp, t_fetch, t_demap = [], [], [], [], []
    up_b = dn_b = 0
    for _ in range(iters):
        x = src.read(block)
        by_bucket = {}
        for slot in an._inspectors.values():
            ks = an._kslots[slot.handle]
            by_bucket.setdefault(ks.bucket.decimation, []).append(slot)
        (d, slots), = by_bucket.items()
        bucket = an._buckets[d]

        t0 = time.perf_counter()
        xw = bucket.raw.frame_packed(x, i16=an._in_i16)
        t1 = time.perf_counter()
        xw_dev = jax.device_put(xw)
        jax.block_until_ready(xw_dev)
        t2 = time.perf_counter()
        an._spectrum.feed_ema(xw_dev)
        h = an._dispatch_bucket(bucket, slots, x, xw_dev)
        jax.block_until_ready(h.get("pack"))
        t3 = time.perf_counter()
        if "pack" in h:
            buf = np.asarray(h["pack"])
            dn_b = buf.nbytes
            h["_buf"] = buf
        t4 = time.perf_counter()
        msgs = an._drain_bucket(h)
        t5 = time.perf_counter()
        t_frame.append(t1 - t0)
        t_h2d.append(t2 - t1)
        t_disp.append(t3 - t2)
        t_fetch.append(t4 - t3)
        t_demap.append(t5 - t4)
        up_b = xw.nbytes
        del msgs
    pack_rows = dn_b // 2 // an._compact_cols if dn_b else 0
    return {
        "eng_frame_ms": round(med(t_frame) * 1e3, 2),
        "eng_h2d_ms": round(med(t_h2d) * 1e3, 2),
        "eng_dispatch_ms": round(med(t_disp) * 1e3, 2),
        "eng_fetch_ms": round(med(t_fetch) * 1e3, 2),
        "eng_demap_ms": round(med(t_demap) * 1e3, 2),
        "eng_h2d_bytes": up_b,
        "eng_d2h_bytes": dn_b,
        "eng_pack_rows": pack_rows,
        "eng_pack_width": an._compact_cols,
    }


def main():
    out = {}
    out.update(profile_e2e())
    print(json.dumps(out), flush=True)
    out.update(profile_engine())
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
