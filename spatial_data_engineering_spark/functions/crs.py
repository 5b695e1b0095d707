"""Coordinate reference system transforms (no pyproj in the container).

Implements the projections the reference exercises (SURVEY.md §2 G1):

- EPSG:4326 (WGS84 lon/lat)
- EPSG:3857 (Web Mercator — spherical, the area-measurement CRS of
  load_report.py:376-380)
- EPSG:326xx / 327xx (WGS84 UTM north/south, e.g. 32750 = UTM 50S used at
  r:46-47; the gpkg's SRID 100000 aliases 32750 per SURVEY.md §1.2)

UTM uses the standard Karney/Krüger series (order 6) from the public
literature ("Transverse Mercator with an accuracy of a few nanometers",
Karney 2011) — accurate to well under a millimetre, which pytest asserts by
round-trip.  All functions are numpy-vectorized: the ST_Transform pandas
UDF calls them once per Arrow batch.
"""

from __future__ import annotations

import math

import numpy as np

_R = 6378137.0  # WGS84 semi-major axis
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_K0 = 0.9996
_N = _F / (2.0 - _F)

# Krüger series coefficients (alpha: geodetic->TM, beta: TM->geodetic),
# series in n up to n^6.
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630
    - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360 - 81 * _N**5 / 512
    + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
)
# rectifying-radius factor
_A1 = _R / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)


def utm_params(epsg: int):
    if 32601 <= epsg <= 32660:
        zone, north = epsg - 32600, True
    elif 32701 <= epsg <= 32760:
        zone, north = epsg - 32700, False
    else:
        raise ValueError(f"not a WGS84 UTM EPSG: {epsg}")
    lon0 = math.radians(-183.0 + 6.0 * zone)
    return lon0, (0.0 if north else 10_000_000.0)


def lonlat_to_utm(lon, lat, epsg: int):
    lon0, fn = utm_params(epsg)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - lon0
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    # conformal latitude
    e = math.sqrt(_E2)
    t = np.sinh(np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = _K0 * _A1 * eta + 500_000.0
    y = _K0 * _A1 * xi + fn
    return x, y


def utm_to_lonlat(x, y, epsg: int):
    lon0, fn = utm_params(epsg)
    xi = (np.asarray(y, dtype=np.float64) - fn) / (_K0 * _A1)
    eta = (np.asarray(x, dtype=np.float64) - 500_000.0) / (_K0 * _A1)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    t = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    chi = np.arctan(t)  # conformal latitude
    # inverse of conformal latitude by Newton iteration
    e = math.sqrt(_E2)
    phi = chi.copy()
    for _ in range(6):
        s = np.sin(phi)
        f = (np.arctanh(s) - e * np.arctanh(e * s)
             - np.arctanh(np.sin(chi) / 1.0))
        # solve arctanh(sin phi) - e*arctanh(e sin phi) = arctanh(sin chi)
        df = 1.0 / np.cos(phi) - e * e * np.cos(phi) / (1 - e * e * s * s)
        phi = phi - f / df
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam + lon0), np.degrees(phi)


def lonlat_to_webmerc(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _R * np.radians(lon)
    y = _R * np.log(np.tan(math.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmerc_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R)
    lat = np.degrees(2 * np.arctan(np.exp(y / _R)) - math.pi / 2)
    return lon, lat


def transform_xy(x, y, src: int, dst: int):
    """Vectorized coordinate transform between supported EPSG codes."""
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    # normalize through lon/lat
    if src == 4326:
        lon, lat = np.asarray(x, np.float64), np.asarray(y, np.float64)
    elif src == 3857:
        lon, lat = webmerc_to_lonlat(x, y)
    else:
        lon, lat = utm_to_lonlat(x, y, src)
    if dst == 4326:
        return lon, lat
    if dst == 3857:
        return lonlat_to_webmerc(lon, lat)
    return lonlat_to_utm(lon, lat, dst)
