"""Engine transfer-knob decision matrix (r4 VERDICT item 9).

The r4 measurements of {in_i16, in_i8} x {pipeline_depth 2, 3} on the
17-inspector session were inconclusive under the tunnel's ±30%
variance.  This script measures the knobs on the NORTH-STAR session
(1024 open inspectors, production drain) with enough repetitions to
pick defaults: each variant runs `reps` passes of `iters` blocks and
reports every per-pass median, so the spread is visible next to the
medians.  Output committed as scripts/tpu_engine_variants.out.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sigdigger_tpu.utils.compile_cache import enable  # noqa: E402

enable()

import jax  # noqa: E402

from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer  # noqa: E402
from sigdigger_tpu.profiles import SourceProfile  # noqa: E402
from sigdigger_tpu.sources.base import SignalSource  # noqa: E402
from sigdigger_tpu.types import AnalyzerParams, Channel  # noqa: E402

SAMPLE_RATE = 102_400_000.0
BLOCK = 8192 * 64


class RingSource(SignalSource):
    def __init__(self, profile, blocks):
        super().__init__(profile)
        self._blocks = blocks
        self._i = 0

    def _read_impl(self, n):
        b = self._blocks[self._i % len(self._blocks)]
        self._i += 1
        assert len(b) == n
        return b


def make_blocks(n, seed):
    rng = np.random.default_rng(seed)
    return [(rng.standard_normal(BLOCK)
             + 1j * rng.standard_normal(BLOCK)).astype(np.complex64)
            for _ in range(n)]


def run_variant(i8: bool, depth: int, iters: int = 6,
                reps: int = 3) -> dict:
    prof = SourceProfile(type="synth", sample_rate=int(SAMPLE_RATE))
    src = RingSource(prof, make_blocks(iters + 4, seed=depth * 7 +
                                       (3 if i8 else 0)))
    params = AnalyzerParams()
    params.window_size = 4096
    an = KernelAnalyzer(source=src, params=params, block_size=BLOCK,
                        n_slots=1024, decimation=64, audio_decim=32,
                        compact_cols=1024, interpret=False,
                        pipeline_depth=depth, symbol_group=4,
                        drain_thread=True, in_i8=i8)
    with an.bulk_config():
        for i in range(832):
            an.open_inspector(
                "audio", Channel(fc=-48e6 + i * 115e3, bw=200e3),
                config={"audio.demodulator": 2, "audio.volume": 1.0,
                        "audio.sample-rate": an.audio_rate})
        for i in range(48):
            an.open_inspector(
                "psk", Channel(fc=1e6 + i * 500e3, bw=400e3),
                config={"afc.bits-per-symbol": 2,
                        "clock.baud": an.channel_rate / 8.0})
        for i in range(8):
            an.open_inspector(
                "fsk", Channel(fc=26e6 + i * 500e3, bw=400e3),
                config={"fsk.bits-per-symbol": 1,
                        "clock.baud": an.channel_rate / 8.0})
        for i in range(8):
            an.open_inspector(
                "ask", Channel(fc=31e6 + i * 500e3, bw=400e3),
                config={"ask.bits-per-symbol": 1,
                        "clock.baud": an.channel_rate / 8.0})
        for i in range(128):
            an.open_inspector(
                "power", Channel(fc=34e6 + i * 100e3, bw=100e3),
                config={"power.integrate-samples": 8192})
    an.poll()
    for _ in range(2):
        an.step()
        an.poll()
    msps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            an.step()
            an.poll()
        if an._drain_q is not None:
            an._drain_q.join()
        an.poll()
        msps.append(round(
            iters * BLOCK / (time.perf_counter() - t0) / 1e6, 2))
    return {"i8": i8, "depth": depth, "msps_per_rep": msps,
            "median_msps": float(np.median(msps)),
            "n_inspectors": len(an._inspectors)}


def main():
    out = []
    for i8 in (False, True):
        for depth in (2, 3):
            r = run_variant(i8, depth)
            out.append(r)
            print(json.dumps(r), flush=True)
    best = max(out, key=lambda r: r["median_msps"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
