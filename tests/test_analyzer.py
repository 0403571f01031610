"""Analyzer engine: message stream, inspector lifecycle, detection."""

import numpy as np

from sigdigger_tpu.analyzer import (
    Analyzer,
    AnalyzerRequestTracker,
    InspectorMessageKind,
    MessageKind,
)
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.types import AnalyzerParams, Channel, WindowFunction


def tone_profile(**kw):
    base = dict(type="tonegen", sample_rate=1_024_000, tone_freq=100_000.0,
                noise_db=-60.0)
    base.update(kw)
    return SourceProfile(**base)


def small_params(**kw):
    base = dict(window_size=1024, psd_update_interval=0.0,
                channel_update_interval=0.01,
                window_function=WindowFunction.BLACKMANN_HARRIS,
                spectrum_avg_alpha=0.25)
    base.update(kw)
    return AnalyzerParams(**base)


def drain(an, kinds=None):
    msgs = an.poll()
    if kinds is None:
        return msgs
    return [m for m in msgs if m.kind in kinds]


def test_psd_messages_and_peak():
    an = Analyzer(profile=tone_profile(), params=small_params())
    for _ in range(4):
        assert an.step()
    psds = drain(an, {MessageKind.PSD})
    assert psds
    p = psds[-1]
    assert p.fft_size == 1024
    assert p.sample_rate == 1_024_000
    freqs = np.linspace(-512_000, 512_000, 1024, endpoint=False)
    assert abs(freqs[np.argmax(p.data)] - 100_000.0) < 1500


def test_source_info_message():
    an = Analyzer(profile=tone_profile(freq=433e6))
    infos = drain(an, {MessageKind.SOURCE_INFO})
    assert infos and infos[0].info.frequency == 433e6
    assert infos[0].info.seekable


def test_channel_detection():
    an = Analyzer(profile=tone_profile(noise_db=-40.0),
                  params=small_params())
    for _ in range(30):
        an.step()
    chans = drain(an, {MessageKind.CHANNEL})
    assert chans
    found = chans[-1].channels
    assert any(abs(c.fc - 100_000.0) < 5000 for c in found)


def test_inspector_open_process_close():
    an = Analyzer(profile=tone_profile(), params=small_params())
    h = an.open_inspector("raw", Channel(fc=100_000.0, bw=20_000.0),
                          request_id=42, config={"agc.enabled": False})
    opens = [m for m in drain(an, {MessageKind.INSPECTOR})
             if m.inspector_kind == InspectorMessageKind.OPEN]
    assert opens and opens[0].request_id == 42
    assert opens[0].equiv_rate > 0
    an.step()
    samps = drain(an, {MessageKind.SAMPLES})
    assert samps and samps[0].handle == h
    # tone at channel center → amplitude ~1 after transient
    y = samps[0].samples
    assert np.allclose(np.abs(y[64:]), 1.0, atol=0.05)
    an.close_inspector(h)
    closes = [m for m in drain(an, {MessageKind.INSPECTOR})
              if m.inspector_kind == InspectorMessageKind.CLOSE]
    assert closes
    an.step()
    assert not drain(an, {MessageKind.SAMPLES})


def test_inspector_config_roundtrip():
    an = Analyzer(profile=tone_profile(), params=small_params())
    h = an.open_inspector("psk", Channel(fc=0.0, bw=50_000.0))
    drain(an)
    an.set_inspector_config(h, {"afc.bits-per-symbol": 2,
                                "clock.baud": 2400.0}, request_id=7)
    acks = [m for m in drain(an, {MessageKind.INSPECTOR})
            if m.inspector_kind == InspectorMessageKind.SET_CONFIG]
    assert acks and acks[0].request_id == 7
    assert acks[0].config["afc.bits-per-symbol"] == 2
    assert acks[0].config["clock.baud"] == 2400.0


def test_inspector_retune_and_bandwidth():
    an = Analyzer(profile=tone_profile(), params=small_params())
    h = an.open_inspector("raw", Channel(fc=50_000.0, bw=20_000.0),
                          config={"agc.enabled": False})
    drain(an)
    an.set_inspector_freq(h, 100_000.0)
    an.set_inspector_bandwidth(h, 10_000.0)
    kinds = [m.inspector_kind for m in drain(an, {MessageKind.INSPECTOR})]
    assert InspectorMessageKind.SET_FREQ in kinds
    assert InspectorMessageKind.SET_BANDWIDTH in kinds
    an.step()
    samps = drain(an, {MessageKind.SAMPLES})
    y = samps[0].samples
    assert np.allclose(np.abs(y[64:]), 1.0, atol=0.05)


def test_wrong_handle():
    an = Analyzer(profile=tone_profile())
    an.set_inspector_config(999, {}, request_id=3)
    msgs = [m for m in drain(an, {MessageKind.INSPECTOR})
            if m.inspector_kind == InspectorMessageKind.WRONG_HANDLE]
    assert msgs and msgs[0].request_id == 3


def test_estimators_emitted():
    # OOK-style tone bursts → envelope periodicity at the baud rate
    an = Analyzer(profile=tone_profile(tone_freq=0.0, noise_db=-60.0),
                  params=small_params())
    h = an.open_inspector("raw", Channel(fc=0.0, bw=100_000.0))
    an.set_estimator(h, "offset", True)
    drain(an)
    an.step()
    ests = [m for m in drain(an, {MessageKind.INSPECTOR})
            if m.inspector_kind == InspectorMessageKind.ESTIMATOR]
    assert ests and ests[0].estimator_id == "offset"
    assert abs(ests[0].estimator_value) < 1000.0  # tone at channel center


def test_inspector_spectrum_source():
    an = Analyzer(profile=tone_profile(), params=small_params())
    h = an.open_inspector("raw", Channel(fc=100_000.0, bw=50_000.0))
    an.set_spectrum_source(h, 1)
    drain(an)
    an.step()
    specs = [m for m in drain(an, {MessageKind.INSPECTOR})
             if m.inspector_kind == InspectorMessageKind.SPECTRUM]
    assert specs and specs[0].spectrum_data is not None


def test_eos_on_file_end(tmp_path):
    data = np.zeros(8192, np.complex64)
    path = tmp_path / "short.cf32"
    data.tofile(path)
    prof = SourceProfile(type="file", path=str(path), sample_rate=8192)
    an = Analyzer(profile=prof, params=small_params())
    steps = 0
    while an.step() and steps < 10:
        steps += 1
    msgs = drain(an)
    assert any(m.kind == MessageKind.EOS for m in msgs)


def test_pump_thread_and_halt():
    an = Analyzer(profile=tone_profile(), params=small_params())
    an.start()
    msg = an.read(timeout=10.0)
    assert msg is not None
    an.halt()
    msgs = [an.read(timeout=1.0) for _ in range(50)]
    assert any(m is not None and m.kind == MessageKind.HALT for m in msgs)


def test_request_tracker():
    an = Analyzer(profile=tone_profile(), params=small_params())
    tracker = AnalyzerRequestTracker(an)
    fut = tracker.request_open("audio", Channel(fc=100_000.0, bw=12_500.0))
    for m in an.poll():
        tracker.feed(m)
    req = fut.result(timeout=1.0)
    assert req.handle > 0
    assert req.equiv_rate > 0
    assert req.config is not None and "audio.demodulator" in req.config.schema


def test_wide_spectrum_mode():
    from sigdigger_tpu.analyzer.sweep import SpectrumView
    from sigdigger_tpu.sources.synth import Emitter, SynthBandSource
    from sigdigger_tpu.types import AnalyzerMode, SweepStrategy

    prof = SourceProfile(type="synth", sample_rate=2_048_000,
                         noise_db=-60.0)
    src = SynthBandSource(prof, [Emitter(101.0e6, 1.0),
                                 Emitter(105.5e6, 0.7)])
    params = AnalyzerParams(
        mode=AnalyzerMode.WIDE_SPECTRUM, window_size=2048,
        min_freq=100e6, max_freq=108e6,
        sweep_strategy=SweepStrategy.PROGRESSIVE)
    an = Analyzer(source=src, params=params, block_size=2048 * 4)
    view = SpectrumView(100e6, 108e6, bins=4096)
    hops = set()
    for _ in range(16):
        assert an.step()
        for m in drain(an, {MessageKind.PSD}):
            hops.add(m.frequency)
            view.feed(m.data, m.frequency, m.sample_rate, 0.5)
    assert len(hops) >= 8          # progressive covers the partitions
    psd = view.interpolate()
    freqs = view.frequencies()
    floor = np.median(psd)
    for f_em in (101.0e6, 105.5e6):
        i = np.argmin(np.abs(freqs - f_em))
        assert psd[max(0, i - 4):i + 4].max() > 20 * floor


def test_wide_spectrum_needs_tunable_source():
    import pytest
    from sigdigger_tpu.types import AnalyzerMode

    params = AnalyzerParams(mode=AnalyzerMode.WIDE_SPECTRUM,
                            min_freq=0.0, max_freq=1e6)
    with pytest.raises(ValueError):
        Analyzer(profile=tone_profile(), params=params)


def test_set_hop_range():
    from sigdigger_tpu.sources.synth import SynthBandSource
    from sigdigger_tpu.types import AnalyzerMode

    prof = SourceProfile(type="synth", sample_rate=1_000_000)
    src = SynthBandSource(prof, [])
    params = AnalyzerParams(mode=AnalyzerMode.WIDE_SPECTRUM,
                            window_size=1024,
                            min_freq=0.0, max_freq=10e6)
    an = Analyzer(source=src, params=params, block_size=4096)
    an.set_hop_range(50e6, 60e6)
    an.step()
    psds = drain(an, {MessageKind.PSD})
    assert psds and 50e6 <= psds[0].frequency <= 60e6
    an.set_hop_range(5e6, 1e6)  # invalid → status error, range kept
    msgs = drain(an, {MessageKind.STATUS})
    assert msgs and msgs[0].code == -3


def test_inspector_watermark_batches_samples():
    """setInspectorWatermark semantics (reference Suscan/Analyzer.cpp:
    497-507): SamplesMessages are held until the watermark fills; the
    batched message carries exactly the samples the per-block messages
    would have, concatenated, and close() flushes the remainder."""
    an = Analyzer(profile=tone_profile(), params=small_params())
    h = an.open_inspector("audio", Channel(fc=100e3, bw=20e3))
    an.step()
    base = [m for m in drain(an, {MessageKind.SAMPLES})
            if m.handle == h]
    assert base and len(base[-1].samples) > 0
    per_block = len(base[-1].samples)

    wm = int(per_block * 2.5)        # needs 3 blocks to fill
    an.set_inspector_watermark(h, wm, request_id=9)
    acks = [m for m in drain(an, {MessageKind.INSPECTOR})
            if m.inspector_kind == InspectorMessageKind.SET_WATERMARK]
    assert acks and acks[0].request_id == 9

    an.step()
    an.step()
    assert not [m for m in drain(an, {MessageKind.SAMPLES})
                if m.handle == h]      # below watermark: held
    an.step()
    got = [m for m in drain(an, {MessageKind.SAMPLES})
           if m.handle == h]
    assert len(got) == 1
    # resampler block lengths wobble by ±1 sample
    assert abs(len(got[0].samples) - 3 * per_block) <= 3
    assert len(got[0].samples) >= wm

    an.step()                          # one buffered block remains
    an.close_inspector(h)              # close flushes it
    got = [m for m in drain(an, {MessageKind.SAMPLES})
           if m.handle == h]
    assert len(got) == 1
    assert abs(len(got[0].samples) - per_block) <= 1


def test_get_source_time_tracks_stream_position():
    """SourceTimeWidget equivalent (reference
    Analyzer::getSourceTimeStamp, Suscan/Analyzer.cpp:301-308): timed
    sources advance from their start time with the stream position."""
    import time as _time

    import numpy as np

    from sigdigger_tpu.analyzer.engine import Analyzer
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.types import AnalyzerParams

    rate = 65536
    path = _tmp = None
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".cf32")
    os.close(fd)
    try:
        x = np.zeros(rate * 2, np.complex64)
        x.tofile(path)
        t0 = 1_700_000_000.0
        prof = SourceProfile(type="file", path=path, sample_rate=rate,
                             start_time=t0)
        params = AnalyzerParams()
        params.window_size = 1024
        an = Analyzer(profile=prof, params=params, block_size=8192)
        assert abs(an.get_source_time() - t0) < 1e-6
        info = an.source_info
        assert info.has_time and info.source_start_time == t0
        assert abs(info.source_end_time - (t0 + 2.0)) < 1e-6
        for _ in range(4):
            an.step()
        assert abs(an.get_source_time()
                   - (t0 + 4 * 8192 / rate)) < 1e-6
        # live (untimed) sources report capture-anchored wall time
        prof2 = SourceProfile(type="tonegen", sample_rate=rate,
                              tone_freq=1000.0)
        an2 = Analyzer(profile=prof2, params=params, block_size=8192)
        now = _time.time()
        assert abs(an2.get_source_time() - now) < 5.0
    finally:
        os.unlink(path)
