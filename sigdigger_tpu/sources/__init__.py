from sigdigger_tpu.sources.base import SignalSource
from sigdigger_tpu.sources.file import FileSource, convert_raw
from sigdigger_tpu.sources.registry import (
    guess_metadata,
    make_source,
    register_source,
    source_types,
)
from sigdigger_tpu.sources.soapy import SoapySource
from sigdigger_tpu.sources.soapy import (
    register_if_available as _soapy_register,
)
from sigdigger_tpu.sources.stdin_src import StdinSource
from sigdigger_tpu.sources.synth import Emitter, SynthBandSource
from sigdigger_tpu.sources.tonegen import ToneGenSource

_soapy_register()

__all__ = [
    "SignalSource",
    "SoapySource",
    "FileSource",
    "StdinSource",
    "SynthBandSource",
    "Emitter",
    "ToneGenSource",
    "convert_raw",
    "guess_metadata",
    "make_source",
    "register_source",
    "source_types",
]
