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
