"""WaveSampler — offline symbol extraction over a capture selection.

reference Tasks/WaveSampler.cpp:97-333 with include/SamplingProperties.h:
26-52: three sync modes (MANUAL interval averaging, GARDNER closed-loop
incl. inline quad demod for FSK, ZERO_CROSSING threshold slicing) over a
decision space (AMPLITUDE / PHASE / FREQUENCY), emitting sample sets the
Decider then maps to symbol ids.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import numpy as np

from sigdigger_tpu.dsp.clock import (
    GardnerClock,
    manual_sample,
    zero_crossing_sample,
)
from sigdigger_tpu.dsp.decider import (
    DecisionSpace,
    decide_amplitude,
    decide_frequency,
    decide_interval,
    decide_phase,
)
from sigdigger_tpu.dsp.quad import quad_demod
from sigdigger_tpu.tasks.base import CancellableTask


class SyncMode(enum.Enum):
    MANUAL = "manual"
    GARDNER = "gardner"
    ZERO_CROSSING = "zero-crossing"


@dataclass
class SamplingProperties:
    """reference include/SamplingProperties.h:26-52."""

    mode: SyncMode = SyncMode.MANUAL
    space: DecisionSpace = DecisionSpace.AMPLITUDE
    baud: float = 9600.0
    sample_rate: float = 1_000_000.0
    bits_per_symbol: int = 1
    loop_gain: float = 0.05
    sampling_phase: float = 0.0   # MANUAL mode start offset [samples]
    threshold: float = 0.0        # ZERO_CROSSING slicer level


@dataclass
class WaveSampleSet:
    """One emitted batch (reference WaveSampler emits SampleSets)."""

    soft: np.ndarray      # soft decision values
    symbols: np.ndarray   # decided symbol ids


class WaveSampler(CancellableTask):
    def __init__(self, data: np.ndarray, props: SamplingProperties) -> None:
        super().__init__()
        self.data = np.asarray(data, np.complex64)
        self.props = props
        self.sets: list[WaveSampleSet] = []
        self._done = False

    # -- decision space projection -------------------------------------
    def _soft_signal(self) -> np.ndarray:
        p = self.props
        if p.space == DecisionSpace.AMPLITUDE:
            return self.data  # complex kept; decided on |.| later
        if p.space == DecisionSpace.PHASE:
            return self.data
        # FREQUENCY: inline quad demod (reference WaveSampler does the
        # same for FSK in Gardner mode, Tasks/WaveSampler.cpp:192-205)
        return np.asarray(quad_demod(self.data, gain=1.0)).astype(
            np.complex64)

    def _decide(self, soft: np.ndarray) -> np.ndarray:
        p = self.props
        if p.space == DecisionSpace.PHASE:
            return np.asarray(decide_phase(soft, p.bits_per_symbol))
        if p.space == DecisionSpace.AMPLITUDE:
            return np.asarray(decide_amplitude(np.abs(soft),
                                               p.bits_per_symbol))
        return np.asarray(decide_frequency(np.real(soft),
                                           p.bits_per_symbol))

    def work(self) -> bool:
        p = self.props
        sps = p.sample_rate / p.baud
        soft_sig = self._soft_signal()

        if p.mode == SyncMode.MANUAL:
            soft = np.asarray(manual_sample(soft_sig, sps,
                                            p.sampling_phase))
        elif p.mode == SyncMode.GARDNER:
            if sps < 2.0:
                raise ValueError("GARDNER needs >=2 samples/symbol")
            clk = GardnerClock(1, sps=sps, gain=p.loop_gain)
            sym, strobes = clk(soft_sig[None, :])
            soft = np.asarray(sym)[0][np.asarray(strobes)[0]]
        else:  # ZERO_CROSSING — real soft values
            base = (np.abs(soft_sig)
                    if p.space == DecisionSpace.AMPLITUDE
                    else np.real(soft_sig))
            vals = zero_crossing_sample(base, sps, p.threshold)
            soft = vals.astype(np.complex64)
            # slicer output is already bipolar around the threshold
            ids = np.asarray(decide_interval(
                vals, float(vals.min() - 1e-9), float(vals.max() + 1e-9),
                p.bits_per_symbol))
            self.sets.append(WaveSampleSet(soft=vals, symbols=ids))
            self.result = self.sets
            self.set_progress(1.0, "done")
            return False

        ids = self._decide(soft)
        self.sets.append(WaveSampleSet(soft=soft, symbols=ids))
        self.result = self.sets
        self.set_progress(1.0, "done")
        return False
