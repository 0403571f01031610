from sigdigger_tpu.inspectors.audio import AudioDemod, AudioInspector
from sigdigger_tpu.inspectors.base import (
    Inspector,
    inspector_classes,
    make_inspector,
    register_inspector,
)
from sigdigger_tpu.inspectors.digital import (
    AskInspector,
    FskInspector,
    PskInspector,
)
from sigdigger_tpu.inspectors.simple import PowerInspector, RawInspector

__all__ = [
    "AskInspector",
    "AudioDemod",
    "AudioInspector",
    "FskInspector",
    "Inspector",
    "PowerInspector",
    "PskInspector",
    "RawInspector",
    "inspector_classes",
    "make_inspector",
    "register_inspector",
]
