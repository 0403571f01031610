"""Inspector base — per-channel demodulation chains.

The suscan engine attaches an "inspector" to each open channel: a demod
chain configured through the namespaced key-value contract and streaming
sample batches back to the client (reference Suscan/Analyzer.cpp:411-598
async inspector API; class names "psk" / "fsk" / "ask" / "audio" /
"raw" / "power" at reference Default/Inspection/InspToolWidget.cpp:
612,932-950 and Default/Audio/AudioProcessor.cpp:153).

TPU re-design: an inspector instance processes a [channels, T] block of
channelizer output per step — one instance can serve a single analyzer
channel (channels=1) or a whole batched bank of identically-configured
channels (the 1k-channel scaling path).  All state lives in the DSP
stage objects, which carry it across blocks.
"""

from __future__ import annotations

import abc
from typing import Any

from sigdigger_tpu.config import INSPECTOR_SCHEMAS, Config


class Inspector(abc.ABC):
    """One demod chain over [channels, T] complex blocks."""

    class_name: str = ""

    def __init__(self, sample_rate: float, channels: int = 1,
                 config: Config | None = None) -> None:
        self.sample_rate = float(sample_rate)
        self.channels = int(channels)
        schema = INSPECTOR_SCHEMAS[self.class_name]
        self.config = config.copy() if config is not None else Config(schema)
        self._build()

    # -- config ------------------------------------------------------------
    def set_config(self, values: dict[str, Any] | Config) -> None:
        """Apply a config update and rebuild stages (the reference
        round-trips this through SET_CONFIG messages, reference
        Suscan/Analyzer.cpp:487-495)."""
        if isinstance(values, Config):
            values = values.as_dict()
        self.config.update(values)
        self._build()

    @abc.abstractmethod
    def _build(self) -> None:
        """(Re)create DSP stages from ``self.config``."""

    # -- streaming ---------------------------------------------------------
    @abc.abstractmethod
    def process(self, x) -> dict[str, Any]:
        """Process one [channels, T] complex64 block.

        Returns at least ``{"samples": array}`` — the payload the engine
        forwards as a SamplesMessage — plus chain-specific extras.
        """

    def reset(self) -> None:
        self._build()


_REGISTRY: dict[str, type[Inspector]] = {}


def register_inspector(cls: type[Inspector]) -> type[Inspector]:
    _REGISTRY[cls.class_name] = cls
    return cls


def inspector_classes() -> list[str]:
    return sorted(_REGISTRY)


def make_inspector(class_name: str, sample_rate: float, channels: int = 1,
                   config: Config | None = None) -> Inspector:
    try:
        cls = _REGISTRY[class_name]
    except KeyError:
        raise ValueError(
            f"unknown inspector class {class_name!r}; have {inspector_classes()}"
        ) from None
    return cls(sample_rate, channels, config)
