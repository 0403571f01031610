from sigdigger_tpu.dsp.channelizer import Channelizer
from sigdigger_tpu.dsp.spectrum import SpectrumEstimator, psd_frequencies
from sigdigger_tpu.dsp.window import window_energy, window_taps

__all__ = [
    "Channelizer",
    "SpectrumEstimator",
    "psd_frequencies",
    "window_energy",
    "window_taps",
]
