"""SGP4 near-earth orbit propagation + observer geometry.

Equivalent of the sgdp4 C library the reference links for satellite
Doppler prediction (reference include/Suscan/Library.h:154-250,
`<sgdp4/sgdp4.h>`; consumed by FrequencyCorrectionDialog and the audio
inspector's Doppler correction, Default/Audio/AudioProcessor.cpp:429-450).

Implements the standard SGP4 model (Spacetrack Report #3 / Vallado's
revisited formulation) for near-earth objects (period < 225 min):
secular gravity + atmospheric drag, long- and short-period periodics,
in the TEME frame; plus the observer-side math (GMST rotation, site
vectors, range rate → Doppler shift).  Control-rate math → plain numpy
on host, like the reference (it is evaluated once per UI tick).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sigdigger_tpu.orbit.tle import TLE

# WGS-72 constants (the sgdp4/SGP4 standard set)
_XKE = 7.43669161e-2          # sqrt(GM) in earth-radii^1.5/min
_J2 = 1.082616e-3
_J3 = -2.53881e-6
_J4 = -1.65597e-6
_CK2 = 0.5 * _J2
_CK4 = -0.375 * _J4
_XKMPER = 6378.135            # km per earth radius
_S0 = 1.01222928              # s parameter (78 km + ae)
_QOMS2T = 1.88027916e-9       # (q0 - s)^4 in er^4
_A3OVK2 = -_J3 / _CK2
_TWO_PI = 2.0 * np.pi
_MIN_PER_DAY = 1440.0
_EARTH_ROT = 7.29211510e-5    # rad/s
SPEED_OF_LIGHT = 299_792_458.0


@dataclass
class StateVector:
    position: np.ndarray    # km, TEME
    velocity: np.ndarray    # km/s, TEME


class SGP4:
    """Initialize once per TLE; ``propagate(tsince_min)`` → state."""

    def __init__(self, tle: TLE) -> None:
        self.tle = tle
        ecc = tle.ecc
        incl = tle.incl
        n0 = tle.mean_motion      # rad/min

        cosio = np.cos(incl)
        theta2 = cosio * cosio
        x3thm1 = 3.0 * theta2 - 1.0
        eosq = ecc * ecc
        betao2 = 1.0 - eosq
        betao = np.sqrt(betao2)

        # un-Kozai the mean motion
        a1 = (_XKE / n0) ** (2.0 / 3.0)
        del1 = 1.5 * _CK2 * x3thm1 / (a1 * a1 * betao * betao2)
        ao = a1 * (1.0 - del1 * (1.0 / 3.0 + del1 *
                                 (1.0 + 134.0 / 81.0 * del1)))
        delo = 1.5 * _CK2 * x3thm1 / (ao * ao * betao * betao2)
        self.n0dp = n0 / (1.0 + delo)          # rad/min
        self.aodp = ao / (1.0 - delo)          # earth radii

        self.deep_space = _TWO_PI / self.n0dp >= 225.0

        # drag terms
        s4 = _S0
        qoms24 = _QOMS2T
        perigee = (self.aodp * (1.0 - ecc) - 1.0) * _XKMPER
        if perigee < 156.0:
            s4 = perigee - 78.0 if perigee > 98.0 else 20.0
            qoms24 = ((120.0 - s4) / _XKMPER) ** 4
            s4 = s4 / _XKMPER + 1.0
        pinvsq = 1.0 / (self.aodp ** 2 * betao2 ** 2)
        tsi = 1.0 / (self.aodp - s4)
        self.eta = self.aodp * ecc * tsi
        etasq = self.eta ** 2
        eeta = ecc * self.eta
        psisq = abs(1.0 - etasq)
        coef = qoms24 * tsi ** 4
        coef1 = coef / psisq ** 3.5
        c2 = coef1 * self.n0dp * (
            self.aodp * (1.0 + 1.5 * etasq + eeta * (4.0 + etasq))
            + 0.75 * _CK2 * tsi / psisq * x3thm1 *
            (8.0 + 3.0 * etasq * (8.0 + etasq)))
        self.c1 = tle.bstar * c2
        self.sinio = np.sin(incl)
        c3 = 0.0
        if ecc > 1e-4:
            c3 = coef * tsi * _A3OVK2 * self.n0dp * self.sinio / ecc
        self.c3 = c3
        self.omgcof = tle.bstar * c3 * np.cos(tle.argp)
        self.xmcof = 0.0
        if ecc > 1e-4:
            self.xmcof = -(2.0 / 3.0) * coef * tle.bstar / eeta
        x1mth2 = 1.0 - theta2
        self.c4 = 2.0 * self.n0dp * coef1 * self.aodp * betao2 * (
            self.eta * (2.0 + 0.5 * etasq)
            + ecc * (0.5 + 2.0 * etasq)
            - 2.0 * _CK2 * tsi / (self.aodp * psisq) *
            (-3.0 * x3thm1 * (1.0 - 2.0 * eeta + etasq *
                              (1.5 - 0.5 * eeta))
             + 0.75 * x1mth2 * (2.0 * etasq - eeta * (1.0 + etasq)) *
             np.cos(2.0 * tle.argp)))
        self.c5 = 2.0 * coef1 * self.aodp * betao2 * (
            1.0 + 2.75 * (etasq + eeta) + eeta * etasq)

        temp1 = 3.0 * _CK2 * pinvsq * self.n0dp
        temp2 = temp1 * _CK2 * pinvsq
        temp3 = 1.25 * _CK4 * pinvsq * pinvsq * self.n0dp
        self.mdot = (self.n0dp + 0.5 * temp1 * betao * x3thm1
                     + 0.0625 * temp2 * betao *
                     (13.0 - 78.0 * theta2 + 137.0 * theta2 ** 2))
        x1m5th = 1.0 - 5.0 * theta2
        self.omgdot = (-0.5 * temp1 * x1m5th + 0.0625 * temp2 *
                       (7.0 - 114.0 * theta2 + 395.0 * theta2 ** 2)
                       + temp3 * (3.0 - 36.0 * theta2 +
                                  49.0 * theta2 ** 2))
        xhdot1 = -temp1 * cosio
        self.xnodot = xhdot1 + (0.5 * temp2 * (4.0 - 19.0 * theta2)
                                + 2.0 * temp3 * (3.0 - 7.0 * theta2)) \
            * cosio
        self.xnodcf = 3.5 * betao2 * xhdot1 * self.c1
        self.t2cof = 1.5 * self.c1
        self.xlcof = 0.125 * _A3OVK2 * self.sinio * \
            (3.0 + 5.0 * cosio) / (1.0 + cosio)
        self.aycof = 0.25 * _A3OVK2 * self.sinio
        self.delmo = (1.0 + self.eta * np.cos(tle.mean_anomaly)) ** 3
        self.sinmo = np.sin(tle.mean_anomaly)
        self.x7thm1 = 7.0 * theta2 - 1.0
        self.cosio = cosio
        self.theta2 = theta2
        self.x3thm1 = x3thm1
        self.x1mth2 = x1mth2

        self.isimp = (self.aodp * (1.0 - ecc) / 1.0) < \
            (220.0 / _XKMPER + 1.0)
        if not self.isimp:
            c1sq = self.c1 ** 2
            self.d2 = 4.0 * self.aodp * tsi * c1sq
            temp = self.d2 * tsi * self.c1 / 3.0
            self.d3 = (17.0 * self.aodp + s4) * temp
            self.d4 = 0.5 * temp * self.aodp * tsi * \
                (221.0 * self.aodp + 31.0 * s4) * self.c1
            self.t3cof = self.d2 + 2.0 * c1sq
            self.t4cof = 0.25 * (3.0 * self.d3 + self.c1 *
                                 (12.0 * self.d2 + 10.0 * c1sq))
            self.t5cof = 0.2 * (3.0 * self.d4 + 12.0 * self.c1 *
                                self.d3 + 6.0 * self.d2 ** 2 +
                                15.0 * c1sq * (2.0 * self.d2 + c1sq))

    def propagate(self, tsince: float) -> StateVector:
        """Propagate ``tsince`` minutes from epoch → km, km/s (TEME)."""
        tle = self.tle
        ecc = tle.ecc

        xmdf = tle.mean_anomaly + self.mdot * tsince
        omgadf = tle.argp + self.omgdot * tsince
        xnoddf = tle.raan + self.xnodot * tsince
        omega = omgadf
        xmp = xmdf
        tsq = tsince * tsince
        xnode = xnoddf + self.xnodcf * tsq
        tempa = 1.0 - self.c1 * tsince
        tempe = tle.bstar * self.c4 * tsince
        templ = self.t2cof * tsq
        if not self.isimp:
            delomg = self.omgcof * tsince
            delm = self.xmcof * (
                (1.0 + self.eta * np.cos(xmdf)) ** 3 - self.delmo)
            temp = delomg + delm
            xmp = xmdf + temp
            omega = omgadf - temp
            tcube = tsq * tsince
            tfour = tsince * tcube
            tempa = tempa - self.d2 * tsq - self.d3 * tcube - \
                self.d4 * tfour
            tempe = tempe + tle.bstar * self.c5 * \
                (np.sin(xmp) - self.sinmo)
            templ = templ + self.t3cof * tcube + tfour * \
                (self.t4cof + tsince * self.t5cof)
        a = self.aodp * tempa ** 2
        e = ecc - tempe
        e = min(max(e, 1e-6), 0.999999)
        xl = xmp + omega + xnode + self.n0dp * templ
        beta = np.sqrt(1.0 - e * e)
        xn = _XKE / a ** 1.5

        # long period periodics
        axn = e * np.cos(omega)
        temp = 1.0 / (a * beta * beta)
        xll = temp * self.xlcof * axn
        aynl = temp * self.aycof
        xlt = xl + xll
        ayn = e * np.sin(omega) + aynl

        # Kepler solve for (E + omega)
        capu = np.fmod(xlt - xnode, _TWO_PI)
        epw = capu
        for _ in range(10):
            sinepw = np.sin(epw)
            cosepw = np.cos(epw)
            # solve capu = epw - axn*sin(epw) + ayn*cos(epw) (Newton)
            f = capu - epw + axn * sinepw - ayn * cosepw
            fdot = 1.0 - axn * cosepw - ayn * sinepw
            delta = f / fdot
            if abs(delta) > 0.95:
                delta = np.sign(delta) * 0.95
            epw = epw + delta
            if abs(delta) < 1e-12:
                break
        sinepw = np.sin(epw)
        cosepw = np.cos(epw)

        # short period preliminary quantities
        ecose = axn * cosepw + ayn * sinepw
        esine = axn * sinepw - ayn * cosepw
        elsq = axn * axn + ayn * ayn
        temp = 1.0 - elsq
        pl_ = a * temp
        r = a * (1.0 - ecose)
        temp1 = 1.0 / r
        rdot = _XKE * np.sqrt(a) * esine * temp1
        rfdot = _XKE * np.sqrt(pl_) * temp1
        temp2 = a * temp1
        betal = np.sqrt(temp)
        temp3 = 1.0 / (1.0 + betal)
        cosu = temp2 * (cosepw - axn + ayn * esine * temp3)
        sinu = temp2 * (sinepw - ayn - axn * esine * temp3)
        u = np.arctan2(sinu, cosu)
        sin2u = 2.0 * sinu * cosu
        cos2u = 2.0 * cosu * cosu - 1.0
        temp = 1.0 / pl_
        temp1 = _CK2 * temp
        temp2 = temp1 * temp

        # short period periodics
        rk = r * (1.0 - 1.5 * temp2 * betal * self.x3thm1) + \
            0.5 * temp1 * self.x1mth2 * cos2u
        uk = u - 0.25 * temp2 * self.x7thm1 * sin2u
        xnodek = xnode + 1.5 * temp2 * self.cosio * sin2u
        xinck = self.tle.incl + 1.5 * temp2 * self.cosio * \
            self.sinio * cos2u
        rdotk = rdot - xn * temp1 * self.x1mth2 * sin2u
        rfdotk = rfdot + xn * temp1 * (self.x1mth2 * cos2u +
                                       1.5 * self.x3thm1)

        # orientation vectors → position/velocity
        sinuk = np.sin(uk)
        cosuk = np.cos(uk)
        sinik = np.sin(xinck)
        cosik = np.cos(xinck)
        sinnok = np.sin(xnodek)
        cosnok = np.cos(xnodek)
        xmx = -sinnok * cosik
        xmy = cosnok * cosik
        ux = xmx * sinuk + cosnok * cosuk
        uy = xmy * sinuk + sinnok * cosuk
        uz = sinik * sinuk
        vx = xmx * cosuk - cosnok * sinuk
        vy = xmy * cosuk - sinnok * sinuk
        vz = sinik * cosuk

        pos = rk * np.array([ux, uy, uz]) * _XKMPER
        vel = (rdotk * np.array([ux, uy, uz]) +
               rfdotk * np.array([vx, vy, vz])) * _XKMPER / 60.0
        return StateVector(position=pos, velocity=vel)


# ---------------------------------------------------------------------------
# Observer geometry: site position, range rate, Doppler
# ---------------------------------------------------------------------------

def gmst(unix_time: float) -> float:
    """Greenwich mean sidereal time (radians) from unix seconds."""
    jd = unix_time / 86400.0 + 2440587.5
    t = (jd - 2451545.0) / 36525.0
    g = (67310.54841 + (876600.0 * 3600.0 + 8640184.812866) * t
         + 0.093104 * t * t - 6.2e-6 * t ** 3)
    return np.fmod(np.deg2rad(np.fmod(g / 240.0, 360.0)), _TWO_PI)


def site_teme(lat_deg: float, lon_deg: float, alt_km: float,
              unix_time: float) -> tuple[np.ndarray, np.ndarray]:
    """Observer position/velocity in TEME (km, km/s)."""
    lat = np.deg2rad(lat_deg)
    theta = gmst(unix_time) + np.deg2rad(lon_deg)
    # WGS-72 oblate site vector
    f = 1.0 / 298.26
    c = 1.0 / np.sqrt(1.0 + f * (f - 2.0) * np.sin(lat) ** 2)
    s = (1.0 - f) ** 2 * c
    achcp = (_XKMPER * c + alt_km) * np.cos(lat)
    pos = np.array([achcp * np.cos(theta), achcp * np.sin(theta),
                    (_XKMPER * s + alt_km) * np.sin(lat)])
    vel = np.cross([0.0, 0.0, _EARTH_ROT], pos)
    return pos, vel


@dataclass
class PassInfo:
    range_km: float
    range_rate_kms: float
    doppler_hz: float            # at the given downlink frequency
    elevation_deg: float
    azimuth_deg: float


class OrbitPredictor:
    """Satellite Doppler/el/az prediction for a ground site — the
    engine behind the reference's frequency-correction dialog."""

    def __init__(self, tle: TLE, lat_deg: float, lon_deg: float,
                 alt_km: float = 0.0) -> None:
        self.tle = tle
        self.model = SGP4(tle)
        self.site = (lat_deg, lon_deg, alt_km)

    def predict(self, unix_time: float, freq_hz: float) -> PassInfo:
        tsince = (unix_time - self.tle.epoch_unix) / 60.0
        sv = self.model.propagate(tsince)
        rs, vs = site_teme(*self.site, unix_time)
        rel = sv.position - rs
        relv = sv.velocity - vs
        rng = float(np.linalg.norm(rel))
        rate = float(np.dot(rel, relv) / rng)
        dopp = -rate * 1000.0 / SPEED_OF_LIGHT * freq_hz

        # topocentric el/az (SEZ frame)
        lat = np.deg2rad(self.site[0])
        theta = gmst(unix_time) + np.deg2rad(self.site[1])
        sin_lat, cos_lat = np.sin(lat), np.cos(lat)
        sin_th, cos_th = np.sin(theta), np.cos(theta)
        top_s = (sin_lat * cos_th * rel[0] + sin_lat * sin_th * rel[1]
                 - cos_lat * rel[2])
        top_e = -sin_th * rel[0] + cos_th * rel[1]
        top_z = (cos_lat * cos_th * rel[0] + cos_lat * sin_th * rel[1]
                 + sin_lat * rel[2])
        el = np.rad2deg(np.arcsin(np.clip(top_z / rng, -1.0, 1.0)))
        az = np.rad2deg(np.arctan2(top_e, -top_s)) % 360.0
        return PassInfo(range_km=rng, range_rate_kms=rate,
                        doppler_hz=dopp, elevation_deg=float(el),
                        azimuth_deg=float(az))
