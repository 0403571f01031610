"""SGP4 propagation, TLE parsing, Doppler prediction."""

import numpy as np
import pytest

from sigdigger_tpu.orbit import SGP4, OrbitPredictor, parse_tle

# ISS (ZARYA) — historical element set (epoch 2020-01-01ish)
ISS_TLE = """\
ISS (ZARYA)
1 25544U 98067A   20001.00000000  .00016717  00000-0  10270-3 0  9005
2 25544  51.6416 247.4627 0006703 130.5360 325.0288 15.49512410 21395
"""

# NOAA-15 style sun-synchronous bird
NOAA_TLE = """\
1 25338U 98030A   20001.50000000  .00000024  00000-0  26810-4 0  9993
2 25338  98.7310  28.1240 0009674 307.2960  52.7350 14.25912843123456
"""


def fix_checksums(text):
    """Recompute TLE checksums so synthetic sets stay valid."""
    out = []
    for ln in text.splitlines():
        if ln.startswith(("1 ", "2 ")) and len(ln) >= 69:
            body = ln[:68]
            s = 0
            for ch in body:
                if ch.isdigit():
                    s += int(ch)
                elif ch == "-":
                    s += 1
            out.append(body + str(s % 10))
        else:
            out.append(ln)
    return "\n".join(out)


def test_parse_tle_fields():
    tles = parse_tle(fix_checksums(ISS_TLE))
    assert len(tles) == 1
    t = tles[0]
    assert t.name == "ISS (ZARYA)"
    assert t.satnum == 25544
    assert abs(np.rad2deg(t.incl) - 51.6416) < 1e-4
    assert abs(t.ecc - 0.0006703) < 1e-7
    assert t.epoch_year == 2020
    # ~15.5 rev/day → period ~92.9 min
    assert abs(t.period_minutes - 1440.0 / 15.495124) < 0.01


def test_parse_checksum_error():
    bad = fix_checksums(ISS_TLE).replace("9005", "9006").splitlines()
    # flip a digit in line 1's checksum position
    lines = fix_checksums(ISS_TLE).splitlines()
    l1 = lines[1][:68] + str((int(lines[1][68]) + 1) % 10)
    with pytest.raises(ValueError):
        parse_tle("\n".join([lines[0], l1, lines[2]]))


def test_sgp4_orbit_geometry():
    t = parse_tle(fix_checksums(ISS_TLE))[0]
    model = SGP4(t)
    assert not model.deep_space
    sv = model.propagate(0.0)
    r = np.linalg.norm(sv.position)
    v = np.linalg.norm(sv.velocity)
    # ISS: ~420 km altitude, ~7.66 km/s
    assert 6650 < r < 6850, r
    assert 7.4 < v < 7.9, v
    # velocity ⊥ position (near-circular orbit)
    cosang = np.dot(sv.position, sv.velocity) / (r * v)
    assert abs(cosang) < 0.01


def test_sgp4_periodicity():
    t = parse_tle(fix_checksums(ISS_TLE))[0]
    model = SGP4(t)
    p0 = model.propagate(0.0).position
    p1 = model.propagate(t.period_minutes).position
    # one orbit later: back near the start (drag+J2 drift ≪ orbit radius)
    assert np.linalg.norm(p1 - p0) < 150.0


def test_sgp4_sun_synchronous():
    t = parse_tle(fix_checksums(NOAA_TLE))[0]
    sv = SGP4(t).propagate(30.0)
    r = np.linalg.norm(sv.position)
    assert 7100 < r < 7300  # ~810 km altitude


def test_doppler_prediction_bounds():
    t = parse_tle(fix_checksums(ISS_TLE))[0]
    pred = OrbitPredictor(t, lat_deg=40.0, lon_deg=-75.0)
    f0 = 437e6
    info = [pred.predict(t.epoch_unix + dt, f0)
            for dt in range(0, 6000, 30)]
    dopp = np.array([i.doppler_hz for i in info])
    rr = np.array([i.range_rate_kms for i in info])
    # LEO at UHF: |doppler| <= ~10 kHz; range rate <= ~8 km/s
    assert np.max(np.abs(dopp)) < 12_000
    assert np.max(np.abs(rr)) < 8.0
    # doppler crosses zero at closest approach of some pass
    assert (dopp > 0).any() and (dopp < 0).any()
    el = np.array([i.elevation_deg for i in info])
    assert el.max() > 0.0  # at least one visibility window in 100 min


def test_doppler_sign_convention():
    """Approaching satellite (negative range rate) → positive Doppler."""
    t = parse_tle(fix_checksums(ISS_TLE))[0]
    pred = OrbitPredictor(t, lat_deg=40.0, lon_deg=-75.0)
    for dt in range(0, 6000, 10):
        info = pred.predict(t.epoch_unix + dt, 437e6)
        if info.range_rate_kms < -1.0:
            assert info.doppler_hz > 0
            break
    else:
        pytest.skip("no approaching geometry found")


# -- SDP4 deep-space extension ---------------------------------------------

# Spacetrack Report #3 SDP4 verification object (sat 11801): 10.5 h
# period, e=0.73 — exercises dscom/dsinit/dpper without resonance.
SDP4_TLE = """1 11801U          80230.29629788  .01431103  00000-0  14311-1    13
2 11801  46.7916 230.4354 7318036  47.4722  10.4117  2.28537848    13"""

GEO_TLE = """1 19548U 88091B   24100.50000000  .00000100  00000-0  00000-0 0    0
2 19548   3.0000  85.0000 0002000 100.0000 200.0000  1.00273000    0"""

MOLNIYA_TLE = """1 40296U 14074A   24100.50000000  .00000100  00000-0  10000-3 0    0
2 40296  63.4000 200.0000 7400000 270.0000  10.0000  2.00600000    0"""


def test_sdp4_report3_epoch_state():
    """Classic Report #3 deep-space verification case (sat 11801)
    against the published tcppver states at t = 0/360/720 min; with the
    lunar-solar geometry referenced to 1900 Jan 0.5 the model lands
    within tens of meters of the published positions."""
    t = parse_tle(fix_checksums(SDP4_TLE))[0]
    model = SGP4(t)
    assert model.deep_space and model.irez == 0
    cases = {
        0.0: ([7473.37066, 428.95262, 5828.74786],
              [5.107151, 6.444683, -0.186131]),
        360.0: ([-3305.22537, 32410.86328, -24697.17676],
                [-1.301135, -1.151315, -0.283335]),
        720.0: ([14271.28760, 24110.46411, -4725.76837],
                [-0.320504, 2.679841, -2.084053]),
    }
    for tm, (ref_r, ref_v) in cases.items():
        sv = model.propagate(tm)
        assert np.linalg.norm(sv.position - np.array(ref_r)) < 1.0, tm
        assert np.linalg.norm(sv.velocity - np.array(ref_v)) < 1e-3, tm


def test_sdp4_orbit_stays_bounded():
    t = parse_tle(fix_checksums(SDP4_TLE))[0]
    model = SGP4(t)
    r = np.array([np.linalg.norm(model.propagate(tm).position)
                  for tm in np.arange(0.0, 1441.0, 20.0)])
    # a(1-e) ~ 6695 km, a(1+e) ~ 43230 km for these elements
    assert 6400 < r.min() < 7100
    assert 42000 < r.max() < 46000


def test_sdp4_geosync_resonance():
    """24 h resonance path (irez=1): radius pinned at the geostationary
    value over 3 days."""
    t = parse_tle(fix_checksums(GEO_TLE))[0]
    model = SGP4(t)
    assert model.deep_space and model.irez == 1
    r = np.array([np.linalg.norm(model.propagate(tm).position)
                  for tm in np.arange(0.0, 4320.0, 60.0)])
    assert 42050 < r.min() and r.max() < 42280


def test_sdp4_molniya_resonance():
    """12 h resonance path (irez=2): bounded over 3 days, smooth across
    the 720 min integrator step, and propagates backwards."""
    t = parse_tle(fix_checksums(MOLNIYA_TLE))[0]
    model = SGP4(t)
    assert model.deep_space and model.irez == 2
    r = np.array([np.linalg.norm(model.propagate(tm).position)
                  for tm in np.arange(0.0, 4320.0, 15.0)])
    assert 6600 < r.min() < 7300        # perigee ~550 km altitude
    assert 45000 < r.max() < 47500      # apogee
    # velocity-consistent continuity across the integrator boundary
    dt_min = 0.2
    a = model.propagate(720.0 - dt_min / 2)
    b = model.propagate(720.0 + dt_min / 2)
    dr = np.linalg.norm(b.position - a.position)
    v = np.linalg.norm(a.velocity)
    assert dr < 1.5 * v * dt_min * 60.0 + 1.0
    back = model.propagate(-800.0)
    assert np.isfinite(back.position).all()
    assert 6400 < np.linalg.norm(back.position) < 47500


def test_sdp4_predictor_integration():
    """OrbitPredictor accepts a deep-space TLE (reference accepts any
    TLE via orbit_init_from_data, include/Suscan/Library.h:154-250)."""
    t = parse_tle(fix_checksums(GEO_TLE))[0]
    pred = OrbitPredictor(t, lat_deg=0.0, lon_deg=80.0)
    info = pred.predict(t.epoch_unix + 3600.0, 4e9)
    assert np.isfinite(info.doppler_hz)
    # geostationary: range rate is tiny
    assert abs(info.range_rate_kms) < 0.05
    assert 35000 < info.range_km < 43000
