"""Orbit → engine wiring: live Doppler correction + ORBIT_REPORT.

reference include/Suscan/Analyzer.h:353-354
(setInspectorDopplerCorrection / disableDopplerCorrection →
suscan_analyzer_inspector_set_tle_async, Suscan/Analyzer.cpp:568-592),
applied live by the audio chain
(Default/Audio/AudioProcessor.cpp:429-450), reported through
InspectorMessage OrbitReport
(include/Suscan/Messages/InspectorMessage.h:33-77).
"""

import numpy as np

from sigdigger_tpu.analyzer.engine import Analyzer
from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
from sigdigger_tpu.analyzer.messages import (
    InspectorMessageKind,
    MessageKind,
)
from sigdigger_tpu.orbit import OrbitPredictor, parse_tle
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.sources import SynthBandSource
from sigdigger_tpu.types import AnalyzerParams, Channel

from test_orbit import ISS_TLE, fix_checksums

FS = 256_000
RF_CENTER = 437_500_000.0        # UHF satellite band
SITE = (40.0, -105.0, 1.6)       # Boulder-ish ground site


def make_predictor():
    tle = parse_tle(fix_checksums(ISS_TLE))[0]
    return OrbitPredictor(tle, *SITE)


def pick_pass_time(pred):
    """A time (near epoch) where the bird is above the horizon AND the
    Doppler shift is large (pass edge, not closest approach where the
    shift crosses zero)."""
    t0 = pred.tle.epoch_unix
    best, best_d = t0, -1.0
    for dt in np.arange(0.0, 86400.0, 30.0):
        info = pred.predict(t0 + dt, RF_CENTER)
        if info.elevation_deg > 2.0 and \
                abs(info.doppler_hz) > best_d:
            best_d = abs(info.doppler_hz)
            best = t0 + dt
    assert best_d > 100.0, "no usable pass found near epoch"
    return best


def orbit_msgs(msgs):
    return [m for m in msgs
            if m.kind == MessageKind.INSPECTOR
            and m.inspector_kind == InspectorMessageKind.ORBIT_REPORT]


def chan_f0(an, handle):
    slot = an._inspectors[handle]
    if isinstance(an, KernelAnalyzer):
        ks = an._kslots[handle]
        return float(ks.bucket.raw._f0[ks.idx] - ks.offset)
    n_sub, i = an._channelizer._handles[slot.chan_handle]
    return float(an._channelizer._buckets[n_sub].slots[i].f0)


def run_engine(cls, **kw):
    prof = SourceProfile(type="synth", sample_rate=FS,
                         freq=RF_CENTER)
    src = SynthBandSource(prof, [], seed=3)
    params = AnalyzerParams()
    params.window_size = 4096
    return cls(source=src, params=params, block_size=32768, **kw)


def _check_tracking(an):
    pred = make_predictor()
    t_pass = pick_pass_time(pred)

    h = an.open_inspector("audio", Channel(fc=40e3, bw=12e3),
                          config={"audio.demodulator": 2})
    an.poll()
    # anchor stream time at the pass (deterministic rx_time)
    an._wall0 = t_pass
    an.orbit_report_interval = 0.05
    an.set_inspector_doppler_correction(h, pred, request_id=11)

    f0s, expected = [], []
    for _ in range(4):
        an.step()
        rx_time = an._wall0 + an._samples_done / an.sample_rate
        f0s.append(chan_f0(an, h))
        expected.append(
            40e3 + pred.predict(rx_time, RF_CENTER + 40e3).doppler_hz)
    msgs = orbit_msgs(an.poll())

    # the channel center follows the predicted Doppler (reference
    # behavior: the inspector's effective LO tracks the shifted
    # carrier while the user-visible lo stays put)
    for got, want in zip(f0s, expected):
        assert abs(got - want) < 2.0, (got, want)
    dopp = np.asarray(f0s) - 40e3
    assert np.abs(dopp).max() > 100.0, "no real Doppler at pass time"
    assert an._inspectors[h].lo == 40e3

    # ORBIT_REPORT stream with a physical payload
    assert msgs, "no ORBIT_REPORT emitted"
    rep = msgs[-1].payload
    assert rep.elevation_deg > -90.0 and 0.0 <= rep.azimuth_deg < 360.0
    assert 300.0 < rep.distance_km < 5000.0
    assert abs(rep.freq_corr_hz - dopp[-1]) < 2.0
    # freq_corr = -vlos/c * f within report precision
    c_kms = 299792.458
    assert abs(rep.freq_corr_hz
               + rep.vlos_vel_kms / c_kms * (RF_CENTER + 40e3)) < 2.0

    # disable restores the nominal LO
    an.disable_doppler_correction(h)
    assert abs(chan_f0(an, h) - 40e3) < 1e-6
    an.step()
    assert not orbit_msgs(an.poll())


def test_generic_engine_tracks_doppler():
    _check_tracking(run_engine(Analyzer))


def test_kernel_engine_tracks_doppler():
    an = run_engine(KernelAnalyzer, interpret=True, decimation=16)
    _check_tracking(an)


def test_wire_protocol_doppler_roundtrip():
    """SET_INSPECTOR_DOPPLER / DISABLE over the suscan-wire server."""
    import time

    from sigdigger_tpu.io.suscan_wire import (
        SuscanWireClient,
        SuscanWireServer,
    )

    an = run_engine(Analyzer)
    h = an.open_inspector("audio", Channel(fc=40e3, bw=12e3))
    an.poll()
    an._wall0 = pick_pass_time(make_predictor())

    srv = SuscanWireServer(an, host="127.0.0.1", port=0)
    try:
        cli = SuscanWireClient("127.0.0.1", srv.address[1])
        cli.set_inspector_doppler_correction(
            h, fix_checksums(ISS_TLE), *SITE)
        deadline = time.time() + 5.0
        while abs(chan_f0(an, h) - 40e3) < 50.0:
            assert time.time() < deadline, "no correction applied"
            time.sleep(0.02)
        cli.disable_doppler_correction(h)
        deadline = time.time() + 5.0
        while abs(chan_f0(an, h) - 40e3) > 1e-6:
            assert time.time() < deadline, "correction not disabled"
            time.sleep(0.02)
        cli.close()
    finally:
        srv.close()


def test_orbit_report_roundtrips_the_wire():
    """ORBIT_REPORT payloads must survive the remote-analyzer wire
    (the reference streams OrbitReport in InspectorMessages,
    include/Suscan/Messages/InspectorMessage.h:33-77)."""
    from sigdigger_tpu.analyzer.messages import (
        InspectorMessage,
        OrbitReport,
    )
    from sigdigger_tpu.io.suscan_wire import (
        decode_call,
        decode_message,
        encode_message,
    )

    rep = OrbitReport(rx_time=1.7e9, azimuth_deg=123.4,
                      elevation_deg=45.6, distance_km=789.0,
                      freq_corr_hz=-4321.0, vlos_vel_kms=6.5)
    msg = InspectorMessage(
        inspector_kind=InspectorMessageKind.ORBIT_REPORT,
        handle=3, inspector_id=3, class_name="audio", lo=40e3,
        payload=rep)
    _, fields = decode_call(encode_message(msg))
    got = decode_message(fields)
    assert got.inspector_kind == InspectorMessageKind.ORBIT_REPORT
    assert got.payload == rep
    # non-orbit messages keep a None payload
    m2 = InspectorMessage(
        inspector_kind=InspectorMessageKind.SET_FREQ, handle=3,
        lo=41e3)
    _, f2 = decode_call(encode_message(m2))
    assert decode_message(f2).payload is None
