"""Source registry + capture metadata guessing.

`make_source` maps a profile's type to a source class (the reference's
source-type registry, reference include/Suscan/Source.h + Registration).
`guess_metadata` infers format/rate from a capture file name and header,
mirroring `Suscan::Source::Config::guessMetadata`
(reference include/Suscan/Source.h:94; Misc/FileViewer.cpp usage).
"""

from __future__ import annotations

import os
import re
from typing import Callable

from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.sources.base import SignalSource
from sigdigger_tpu.sources.file import FileSource
from sigdigger_tpu.sources.stdin_src import StdinSource
from sigdigger_tpu.sources.synth import SynthBandSource
from sigdigger_tpu.sources.tonegen import ToneGenSource
from sigdigger_tpu.types import SampleFormat

_REGISTRY: dict[str, Callable[[SourceProfile], SignalSource]] = {}


def register_source(type_name: str,
                    ctor: Callable[[SourceProfile], SignalSource]) -> None:
    _REGISTRY[type_name] = ctor


register_source("file", FileSource)
register_source("tonegen", ToneGenSource)
register_source("stdin", StdinSource)
register_source("synth", SynthBandSource)


def source_types() -> list[str]:
    return sorted(_REGISTRY)


def make_source(profile: SourceProfile) -> SignalSource:
    try:
        ctor = _REGISTRY[profile.type]
    except KeyError:
        raise ValueError(
            f"unknown source type {profile.type!r}; have {source_types()}"
        ) from None
    return ctor(profile)


_EXT_FORMAT = {
    ".wav": SampleFormat.WAV,
    ".raw": SampleFormat.RAW_COMPLEX64,
    ".cf32": SampleFormat.RAW_COMPLEX64,
    ".cfile": SampleFormat.RAW_COMPLEX64,
    ".cs16": SampleFormat.RAW_INT16,
    ".cs8": SampleFormat.RAW_INT8,
    ".cu8": SampleFormat.RAW_UINT8,
    ".iq": SampleFormat.RAW_COMPLEX64,
}

# SDR capture name conventions carry rate/freq, e.g.
# "gqrx_20240101_000000_145000000_2400000_fc.raw",
# "SDRSharp_..._145000000Hz_....wav", "baseband_145000000Hz_2400000sps.cf32"
_RATE_PATTERNS = [
    re.compile(r"_(\d{4,9})sps", re.I),
    re.compile(r"gqrx_\d+_\d+_\d+_(\d+)_fc", re.I),
    re.compile(r"_(\d{4,9})(?:hz)?[_.]fc", re.I),
]
_FREQ_PATTERNS = [
    re.compile(r"_(\d{5,12})Hz", re.I),
    re.compile(r"gqrx_\d+_\d+_(\d+)_\d+_fc", re.I),
]


def guess_metadata(path: str) -> SourceProfile:
    """Best-effort profile for a capture file."""
    name = os.path.basename(path)
    ext = os.path.splitext(name)[1].lower()
    profile = SourceProfile(type="file", path=path, label=name)
    profile.format = _EXT_FORMAT.get(ext, SampleFormat.RAW_COMPLEX64)
    for pat in _RATE_PATTERNS:
        m = pat.search(name)
        if m:
            profile.sample_rate = int(m.group(1))
            break
    for pat in _FREQ_PATTERNS:
        m = pat.search(name)
        if m:
            profile.freq = float(m.group(1))
            break
    return profile
