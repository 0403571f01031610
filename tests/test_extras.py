"""CMA equalizer, TV processor, device facade, baseband filter hook."""

import numpy as np

from sigdigger_tpu.device import DeviceFacade, DeviceProperties
from sigdigger_tpu.dsp.equalizer import CMAEqualizer
from sigdigger_tpu.dsp.tv import TVProcessor, TVProcessorParams


def test_cma_equalizes_static_channel():
    """A one-tap channel rotation+scale is undone by CMA."""
    rng = np.random.default_rng(0)
    syms = np.exp(1j * (np.pi / 2 * rng.integers(0, 4, 6000))).astype(
        np.complex64)
    channel = 0.5 * np.exp(1j * 0.7)          # attenuation + rotation
    x = (syms * channel)[None, :]
    eq = CMAEqualizer(1, taps=5, rate=5e-3)
    y = np.asarray(eq(x))[0]
    tail = y[4000:]
    # modulus restored to ~1 (CMA corrects amplitude; phase ambiguity ok)
    assert abs(np.mean(np.abs(tail)) - 1.0) < 0.05


def test_cma_locked_does_not_adapt():
    eq = CMAEqualizer(1, taps=5, rate=5e-3, locked=True)
    taps0 = np.asarray(eq.taps).copy()
    x = (0.3 * np.ones(500, np.complex64))[None, :]
    eq(x)
    assert np.array_equal(np.asarray(eq.taps), taps0)


def make_video_signal(params, n_lines, pattern="gradient"):
    """Synthesize a composite-like luminance signal with hsync pulses."""
    spl = int(round(params.samples_per_line))
    sync_len = int(0.07 * spl)
    line = np.ones(spl, np.float32) * 0.5
    if pattern == "gradient":
        vid = np.linspace(0.3, 1.0, spl - 2 * sync_len).astype(np.float32)
    else:
        vid = np.full(spl - 2 * sync_len, 0.8, np.float32)
    line[:sync_len] = 0.0                     # hsync
    line[sync_len:sync_len + len(vid)] = vid
    return np.tile(line, n_lines)


def test_tv_processor_locks_lines():
    params = TVProcessorParams(
        sample_rate=1_000_000.0, line_rate=15625.0,
        lines_per_frame=64, pixels_per_line=128, sync_level=0.15)
    tv = TVProcessor(params)
    sig = make_video_signal(params, 200)
    frames = tv.feed(sig)
    assert frames, "no frame produced"
    frame = frames[0]
    assert frame.shape == (64, 128)
    # gradient pattern: pixel values increase along each line
    mid = frame[10:50]
    assert (np.diff(mid.mean(axis=0)[10:100]) >= -0.02).mean() > 0.9


def test_tv_processor_streaming_chunks():
    params = TVProcessorParams(
        sample_rate=640_000.0, line_rate=10_000.0,
        lines_per_frame=32, pixels_per_line=64)
    tv = TVProcessor(params)
    sig = make_video_signal(params, 150, pattern="flat")
    frames = []
    for i in range(0, len(sig), 7000):
        frames.extend(tv.feed(sig[i:i + 7000]))
    assert len(frames) >= 3
    assert np.isclose(np.median(frames[1]), 0.8, atol=0.25)


def test_device_facade_enumeration():
    fac = DeviceFacade()
    drivers = {d.driver for d in fac.devices()}
    assert {"file", "tonegen", "synth", "stdin"} <= drivers
    dev = fac.devices()[0]
    assert fac.lookup(dev.uuid) is not None
    assert fac.lookup("bogus:") is None


def test_device_facade_hotplug():
    fac = DeviceFacade()
    extra = DeviceProperties(label="Fake SDR", driver="fake")
    import threading

    def plug():
        fac.register_discoverer(lambda: [extra])

    t = threading.Timer(0.1, plug)
    t.start()
    assert fac.wait_for_devices(timeout_ms=3000)
    assert any(d.driver == "fake" for d in fac.devices())
    assert not fac.wait_for_devices(timeout_ms=50)


def test_baseband_filter_tee():
    from sigdigger_tpu.analyzer import Analyzer
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.types import AnalyzerParams

    prof = SourceProfile(type="tonegen", sample_rate=1_024_000,
                         tone_freq=1000.0)
    an = Analyzer(profile=prof,
                  params=AnalyzerParams(window_size=1024))
    seen = []
    an.install_baseband_filter(lambda x: seen.append(len(x)))
    an.step()
    an.step()
    assert seen == [an.block_size, an.block_size]
    an.remove_baseband_filter(an._bb_filters[0])
    an.step()
    assert len(seen) == 2


def test_psk_with_equalizer_enabled():
    from sigdigger_tpu.inspectors import make_inspector

    insp = make_inspector("psk", 32000.0)
    insp.set_config({"equalizer.type": 1, "equalizer.rate": 1e-3,
                     "clock.baud": 4000.0})
    assert insp._eq is not None
    x = np.exp(1j * np.pi / 4 * np.ones(4096)).astype(np.complex64)
    out = insp.process(x[None, :])
    assert np.all(np.isfinite(np.asarray(out["samples"])))
    insp.set_config({"equalizer.type": 0})
    assert insp._eq is None
