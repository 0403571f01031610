"""sigdigger_tpu — a TPU-native real-time signal-analysis framework.

A ground-up re-design of the capabilities of BatchDrake/SigDigger (and the
sigutils/suscan DSP engine it fronts) for TPU hardware: the spectrum path,
channel extraction and demodulator chains are expressed as batched,
block-synchronous JAX/XLA/Pallas computations that scale over device meshes
with `jax.sharding`, instead of the reference's per-sample C loops and
thread pipeline.

Layer map (mirrors SURVEY.md §1, re-expressed TPU-first):

- ``sigdigger_tpu.dsp``        — DSP primitives (sigutils equivalent):
  window taps, PSD, overlap-save channelizer, NCQO, AGC, PLL/Costas,
  Gardner clock recovery, FIR/RRC filters, quad demod, decider.
- ``sigdigger_tpu.kernels``    — Pallas TPU kernels for the hot loops.
- ``sigdigger_tpu.inspectors`` — per-channel demod chains ("raw", "power",
  "audio", "psk", "fsk", "ask") against the suscan config-key contract.
- ``sigdigger_tpu.analyzer``   — the analyzer engine (suscan equivalent):
  channel mode + wide-spectrum sweep, typed message stream.
- ``sigdigger_tpu.sources``    — signal sources: file replay, tone
  generator, stdin; seek/loop/throttle semantics.
- ``sigdigger_tpu.tasks``      — offline DSP task library (SigDigger
  Tasks/ equivalent) for captured arrays.
- ``sigdigger_tpu.parallel``   — mesh/sharding layer: channel + frequency
  tile parallelism, PSD psum, overlap halo handling.
- ``sigdigger_tpu.io``         — savers, exporters (.wav/.mat/.csv),
  socket forwarders, remote-control server.
- ``sigdigger_tpu.orbit``      — SGDP4 satellite propagation + TLE.
"""

from sigdigger_tpu.version import __version__

from sigdigger_tpu.types import (
    AnalyzerMode,
    AnalyzerParams,
    Channel,
    SampleFormat,
    WindowFunction,
)
from sigdigger_tpu.config import Config, ConfigSchema
from sigdigger_tpu.profiles import SourceProfile

__all__ = [
    "__version__",
    "AnalyzerMode",
    "AnalyzerParams",
    "Channel",
    "SampleFormat",
    "SourceProfile",
    "WindowFunction",
    "Config",
    "ConfigSchema",
    "Analyzer",
    "KernelReceiver",
    "Library",
]


def __getattr__(name):
    # heavy imports resolved lazily so `import sigdigger_tpu` stays light
    if name == "Analyzer":
        from sigdigger_tpu.analyzer import Analyzer

        return Analyzer
    if name == "KernelReceiver":
        from sigdigger_tpu.receiver import KernelReceiver

        return KernelReceiver
    if name == "Library":
        from sigdigger_tpu.library import Library

        return Library
    raise AttributeError(name)
