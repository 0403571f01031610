"""Analyzer checkpoint / resume.

The reference persists only configuration (SURVEY.md §5.4); stream
"resume" is source seek/replay.  The TPU build checkpoints the actual
DSP state — stream offset, PSD accumulator, channelizer overlap tail and
per-channel oscillator phases, plus every inspector's config — so a
capture replay can resume exactly where it stopped.

Two engine formats share the container:

- the generic :class:`Analyzer` saves the channelizer tail + per-slot
  phases; demod loop states (PLL/AGC/clock) are deliberately not
  serialized there — they re-acquire within milliseconds (documented
  deviation);
- the :class:`KernelAnalyzer` (the shipping TPU path) saves EVERY
  bank carry plane — framing history, rotator phases, FIR tails,
  squelch/DC EMAs, the full recovery loop state and the device PSD
  EMA — so a restored session is BIT-IDENTICAL to the uninterrupted
  run (r4 VERDICT item 3; per-slot constant columns are rebuilt from
  the saved configs, which are their only inputs).
"""

from __future__ import annotations

import json
import zipfile
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from sigdigger_tpu.analyzer.engine import Analyzer

FORMAT_VERSION = 2

_AUDIO_CARRIES = ("_history", "_prev_re", "_prev_im", "_ftail1",
                  "_ftail2", "_atail1", "_atail2", "_sq", "_dc",
                  "_agcs", "_phi", "_phs_a")


def save_checkpoint(analyzer: "Analyzer", path: str) -> None:
    from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer

    if isinstance(analyzer, KernelAnalyzer):
        _save_kernel(analyzer, path)
        return
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


def _save_kernel(an, path: str) -> None:
    """KernelAnalyzer checkpoint: full bank-carry serialization."""
    import time as _time

    # land on a block edge: drain in-flight pipelined blocks (their
    # messages are emitted, not lost) and let the drain worker finish
    if an._inflight:
        an._emit_block_msgs(an._flush_pipeline(), _time.time())
    if an._drain_q is not None:
        an._drain_q.join()

    arrays: dict[str, np.ndarray] = {}
    slots = []
    for handle, slot in an._inspectors.items():
        ks = an._kslots[handle]
        s = {
            "handle": handle,
            "inspector_id": slot.inspector_id,
            "class": slot.class_name,
            "config": ks.config.as_dict(),
            "f0": slot.lo,
            "bw": slot.bandwidth,
            "estimators": sorted(slot.estimators),
            "spectrum_source": slot.spectrum_source,
            "decimation": ks.bucket.decimation,
            "idx": ks.idx,
            "pw_acc": ks.pw_acc,
            "pw_cnt": ks.pw_cnt,
            "agc_ema": ks.agc_ema,
            "dec_span": ks.dec_span,
            "dec_vmax": ks.dec_vmax,
        }
        if ks.resampler is not None:
            s["rs_pos"] = ks.resampler._pos
            s["rs_last"] = float(ks.resampler._last)
        slots.append(s)
    for d, b in an._buckets.items():
        pre = f"b{d}."
        arrays[pre + "raw_hist"] = np.asarray(b.raw._history)
        arrays[pre + "raw_phi"] = np.asarray(b.raw._phi)
        for nm in _AUDIO_CARRIES:
            arrays[pre + "aud" + nm] = np.asarray(
                getattr(b.audio, nm))
        arrays[pre + "rec_state"] = np.asarray(b.rec.state)

    spec = an._spectrum
    psd = (spec._host_psd() if hasattr(spec, "_host_psd")
           else spec.psd)
    meta = {
        "version": FORMAT_VERSION,
        "engine": "kernel",
        "position": an.source.position,
        "profile": an.profile.to_dict(),
        "params": an.params.to_dict(),
        "psd_count": spec._count,
        "samples_done": an._samples_done,
        "block_size": an.block_size,
        "n_slots": an._n_slots,
        "decimation": an._decimation,
        "audio_decim": an._audio_decim,
        "decimations": list(an._decimations),
        "compact_cols": an._compact_cols,
        "symbol_group": an._symbol_group,
        "inspectors": slots,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        with z.open("psd.npy", "w") as f:
            np.save(f, np.asarray(psd))
        for name, a in arrays.items():
            with z.open(name + ".npy", "w") as f:
                np.save(f, a)


def _load_kernel(meta: dict, z: zipfile.ZipFile):
    from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.types import AnalyzerParams, Channel

    profile = SourceProfile.from_dict(meta["profile"])
    params = AnalyzerParams.from_dict(meta["params"])
    an = KernelAnalyzer(
        profile=profile, params=params,
        block_size=meta["block_size"], n_slots=meta["n_slots"],
        decimation=meta["decimation"],
        audio_decim=meta["audio_decim"],
        decimations=tuple(meta["decimations"]),
        compact_cols=meta["compact_cols"],
        symbol_group=meta["symbol_group"])
    if an.source.seekable:
        an.source.seek(meta["position"])
    an._samples_done = meta["samples_done"]

    with an.bulk_config():
        for s in meta["inspectors"]:
            bucket = an._buckets[s["decimation"]]
            # steer the reopen into the slot's ORIGINAL column — the
            # saved carry planes live at those columns
            bucket.free.remove(s["idx"])
            bucket.free.append(s["idx"])
            handle = an.open_inspector(
                s["class"], Channel(fc=s["f0"], bw=s["bw"]),
                config=s["config"])
            slot = an._inspectors[handle]
            ks = an._kslots[handle]
            if ks.idx != s["idx"] or \
                    ks.bucket.decimation != s["decimation"]:
                raise ValueError(
                    f"restore placed inspector {s['inspector_id']} at "
                    f"bucket 1/{ks.bucket.decimation} slot {ks.idx}, "
                    f"checkpoint says 1/{s['decimation']} slot "
                    f"{s['idx']}")
            an.set_inspector_id(handle, s["inspector_id"])
            for est in s["estimators"]:
                slot.estimators.add(est)
            slot.spectrum_source = s["spectrum_source"]
            ks.pw_acc = s["pw_acc"]
            ks.pw_cnt = s["pw_cnt"]
            ks.agc_ema = s["agc_ema"]
            ks.dec_span = s["dec_span"]
            ks.dec_vmax = s["dec_vmax"]
            if "rs_pos" in s and ks.resampler is not None:
                ks.resampler._pos = s["rs_pos"]
                ks.resampler._last = s["rs_last"]

    # overwrite the bank carries AFTER every reopen (opens reset their
    # slot's columns of these planes)
    def arr(name):
        return np.load(z.open(name + ".npy"))

    for d, b in an._buckets.items():
        pre = f"b{d}."
        b.raw._history = arr(pre + "raw_hist")
        b.raw._phi = arr(pre + "raw_phi")
        for nm in _AUDIO_CARRIES:
            setattr(b.audio, nm, arr(pre + "aud" + nm))
        b.rec.state = arr(pre + "rec_state")

    spec = an._spectrum
    psd = np.load(z.open("psd.npy"))
    spec.psd = psd.astype(np.float64)
    spec._count = meta["psd_count"]
    if hasattr(spec, "_psd_dev") and spec._count > 0:
        import jax.numpy as jnp

        cfg = spec.cfg
        spec._psd_dev = jnp.asarray(
            psd.astype(np.float32).reshape(cfg.b, cfg.a).T)
    an.poll()   # drop replayed open acks
    return an


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
        if meta.get("engine") == "kernel":
            return _load_kernel(meta, z)
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
