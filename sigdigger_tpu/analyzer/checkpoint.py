"""Analyzer checkpoint / resume.

The reference persists only configuration (SURVEY.md §5.4); stream
"resume" is source seek/replay.  The TPU build checkpoints the actual
DSP state — stream offset, PSD accumulator, channelizer overlap tail and
per-channel oscillator phases, plus every inspector's config — so a
capture replay can resume exactly where it stopped.  Demod loop states
(PLL/AGC/clock) are deliberately not serialized: they re-acquire within
milliseconds and their omission keeps checkpoints version-stable
(documented deviation).
"""

from __future__ import annotations

import json
import zipfile
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from sigdigger_tpu.analyzer.engine import Analyzer

FORMAT_VERSION = 1


def save_checkpoint(analyzer: "Analyzer", path: str) -> None:
    chz = analyzer._channelizer
    spec = analyzer._spectrum
    slots = []
    for handle, slot in analyzer._inspectors.items():
        n_sub, idx = chz.slot_of(slot.chan_handle)
        ch = chz._buckets[n_sub].slots[idx]
        slots.append({
            "handle": handle,
            "inspector_id": slot.inspector_id,
            "class": slot.class_name,
            "config": slot.inspector.config.as_dict(),
            "f0": ch.f0,
            "bw": slot.bandwidth,
            "estimators": sorted(slot.estimators),
            "spectrum_source": slot.spectrum_source,
            "phase": ch.phase,
        })
    meta = {
        "version": FORMAT_VERSION,
        "position": analyzer.source.position,
        "profile": analyzer.profile.to_dict(),
        "params": analyzer.params.to_dict(),
        "psd_count": spec.state.count,
        "frame_index": chz._frame_index,
        "inspectors": slots,
        "samples_done": analyzer._samples_done,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        with z.open("psd.npy", "w") as f:
            np.save(f, np.asarray(spec.state.psd))
        with z.open("tail.npy", "w") as f:
            np.save(f, np.asarray(chz._tail))


def load_checkpoint(path: str) -> "Analyzer":
    from sigdigger_tpu.analyzer.engine import Analyzer
    from sigdigger_tpu.dsp.spectrum import SpectrumState
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.types import AnalyzerParams, Channel

    import jax.numpy as jnp

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta["version"] > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint version {meta['version']} too new")
        psd = np.load(z.open("psd.npy"))
        tail = np.load(z.open("tail.npy"))

    profile = SourceProfile.from_dict(meta["profile"])
    params = AnalyzerParams.from_dict(meta["params"])
    analyzer = Analyzer(profile=profile, params=params)
    if analyzer.source.seekable:
        analyzer.source.seek(meta["position"])
    analyzer._spectrum.state = SpectrumState(
        psd=jnp.asarray(psd), count=meta["psd_count"])
    analyzer._channelizer._tail = jnp.asarray(tail)
    analyzer._channelizer._frame_index = meta["frame_index"]
    analyzer._samples_done = meta["samples_done"]

    for s in meta["inspectors"]:
        handle = analyzer.open_inspector(
            s["class"], Channel(fc=s["f0"], bw=s["bw"]),
            config=s["config"])
        slot = analyzer._inspectors[handle]
        analyzer.set_inspector_id(handle, s["inspector_id"])
        for est in s["estimators"]:
            slot.estimators.add(est)
        slot.spectrum_source = s["spectrum_source"]
        n_sub, idx = analyzer._channelizer.slot_of(slot.chan_handle)
        analyzer._channelizer._buckets[n_sub].slots[idx].phase = s["phase"]
    analyzer.poll()   # drop replayed open acks
    return analyzer
