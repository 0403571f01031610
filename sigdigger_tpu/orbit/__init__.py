from sigdigger_tpu.orbit.sgp4 import (
    SGP4,
    OrbitPredictor,
    PassInfo,
    StateVector,
    gmst,
    site_teme,
)
from sigdigger_tpu.orbit.tle import TLE, parse_tle

__all__ = [
    "SGP4",
    "OrbitPredictor",
    "PassInfo",
    "StateVector",
    "TLE",
    "gmst",
    "parse_tle",
    "site_teme",
]
