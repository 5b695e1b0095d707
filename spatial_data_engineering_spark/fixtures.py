"""Deterministic fixture generation (FIXTURES.md §1-§6).

Mirrors the reference's real inputs: the `lu` GeoPackage vector table
(31 MultiPolygon features in UTM 50S around Balikpapan), the 1-row
`lu.csv` attribute table, and a Landsat-like pixel collection over the lu
envelope.  Geometry is WKT in fixtures (FIXTURES.md preamble); the engine
converts to WKB at ingest.

Everything is seeded numpy — same bytes every run.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .functions import crs as _crs

# reference envelope (FIXTURES.md §1): UTM 50S metres, Balikpapan
ENV_X = (476232.0, 477477.0)
ENV_Y = (9873071.0, 9876194.0)
EPSG_LU = 32750

LUSE_POOL = [
    "Kawasan Buffer Zone", "Sungai", "Kawasan Industri Besar",
    "Kawasan Sempadan Pantai", "Kawasan Hutan Bakau",
]
KETERANGAN_POOL = [
    "Mangrove Sungai Sanrumukti", "Kawasan Hutan Bakau Tempadung",
    "Kawasan Hutan Bakau Beranga", "Sungai Tengah", "Kawasan Industri",
    "Kawasan Sempadan Pantai", "Mangrove Teluk Balikpapan",
]


def make_lu(n_rows: int = 31, seed: int = 42) -> pd.DataFrame:
    """Vector feature table: convex quads, jittered centers (FIXTURES §1)."""
    rng = np.random.RandomState(seed)
    rows = []
    for fid in range(1, n_rows + 1):
        cx = rng.uniform(*ENV_X)
        cy = rng.uniform(*ENV_Y)
        half = rng.uniform(50.0, 1000.0)
        # convex quad: jittered box corners (stays convex)
        jit = rng.uniform(-0.3 * half, 0.3 * half, size=8)
        pts = [
            (cx - half + jit[0], cy - half + jit[1]),
            (cx + half + jit[2], cy - half + jit[3]),
            (cx + half + jit[4], cy + half + jit[5]),
            (cx - half + jit[6], cy + half + jit[7]),
        ]
        ring = ", ".join(f"{x:.3f} {y:.3f}" for x, y in pts + [pts[0]])
        rows.append({
            "fid": fid,
            "geom_wkt": f"MULTIPOLYGON ((({ring})))",
            "LUSE": LUSE_POOL[fid % len(LUSE_POOL)],
            "KETERANGAN": KETERANGAN_POOL[fid % len(KETERANGAN_POOL)],
            "TEMA": "Hutan",
        })
    return pd.DataFrame(rows)


def make_lu_csv() -> pd.DataFrame:
    return pd.DataFrame([
        {"TEMA": "Hutan", "JENIS": "Hutan Rimba",
         "SUMBER": "Interpretasi FU 2014 dan CSRT 2010"},
    ])


def make_landsat_pixels(seed: int = 42, step_m: float = 150.0) -> pd.DataFrame:
    """Image-collection-as-table over the lu envelope (FIXTURES §6).

    Monthly scenes 2018-01..2023-12; some months have zero scenes
    (empty-month path, load_report.py:140-143); acquisition days include
    29-31 (the reference's day-truncation divergence, :70,131).
    """
    rng = np.random.RandomState(seed)
    # pixel grid in lon/lat over the UTM envelope
    lon0, lat0 = _crs.utm_to_lonlat(np.array([ENV_X[0]]), np.array([ENV_Y[0]]), EPSG_LU)
    lon1, lat1 = _crs.utm_to_lonlat(np.array([ENV_X[1]]), np.array([ENV_Y[1]]), EPSG_LU)
    dlon = step_m / 111_320.0
    lons = np.arange(lon0[0], lon1[0], dlon)
    lats = np.arange(lat0[0], lat1[0], dlon)
    gx, gy = np.meshgrid(lons, lats)
    px_lon = gx.ravel()
    px_lat = gy.ravel()

    rows = []
    scene_id = 0
    for year in range(2018, 2024):
        for month in range(1, 13):
            if (year * 12 + month) % 17 == 0:
                continue  # empty month
            n_scenes = rng.randint(1, 4)
            for _ in range(n_scenes):
                scene_id += 1
                day = int(rng.choice([3, 11, 19, 29, 30, 31 if month in
                                      (1, 3, 5, 7, 8, 10, 12) else 28]))
                if month == 2 and day > 28:
                    day = 28
                base = rng.uniform(0.05, 0.15)
                veg = rng.uniform(0.2, 0.6)
                b4 = base + 0.02 * rng.standard_normal(px_lon.size)
                b5 = base + veg + 0.05 * rng.standard_normal(px_lon.size)
                b4 = np.clip(b4, 0.001, 1.0)
                b5 = np.clip(b5, 0.001, 1.0)
                # a few zero/zero pixels exercise NDVI divide-by-zero masking
                dead = rng.choice(px_lon.size, size=3, replace=False)
                b4[dead] = 0.0
                b5[dead] = 0.0
                rows.append(pd.DataFrame({
                    "scene_id": scene_id,
                    "ts": pd.Timestamp(year=year, month=month, day=day, hour=2),
                    "lon": px_lon, "lat": px_lat,
                    "sr_b4": b4, "sr_b5": b5,
                }))
    return pd.concat(rows, ignore_index=True)


def make_elevation_cells(seed: int = 42, n: int = 60) -> pd.DataFrame:
    """Raster-as-table (FIXTURES §4): smooth multi-modal field, ~2% nulls."""
    rng = np.random.RandomState(seed)
    xs = np.linspace(0.0, 100.0, n)
    ys = np.linspace(0.0, 100.0, n)
    gx, gy = np.meshgrid(xs, ys)
    peaks = [(25, 25, 100, 18), (70, 30, 200, 14), (40, 75, 400, 12)]
    elev = np.zeros_like(gx)
    for px, py, h, s in peaks:
        elev += h * np.exp(-((gx - px) ** 2 + (gy - py) ** 2) / (2 * s * s))
    elev += 20.0
    mask = rng.uniform(size=elev.shape) < 0.02
    elev_flat = elev.ravel().astype(float)
    elev_flat[mask.ravel()] = np.nan
    ix, iy = np.meshgrid(np.arange(n), np.arange(n))
    return pd.DataFrame({
        "cell_x": ix.ravel(), "cell_y": iy.ravel(),
        "lon": gx.ravel(), "lat": gy.ravel(),
        "elevation_m": elev_flat,
    })


def make_admin_regions(nx: int = 6, ny: int = 6) -> pd.DataFrame:
    """Zonal polygons (FIXTURES §5): rectangles tiling the elevation bbox."""
    rows = []
    rid = 0
    for j in range(ny):
        for i in range(nx):
            rid += 1
            x0, x1 = i * (100.0 / nx), (i + 1) * (100.0 / nx)
            y0, y1 = j * (100.0 / ny), (j + 1) * (100.0 / ny)
            ring = (f"{x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}")
            rows.append({
                "region_id": rid, "NAME_1": f"Provinsi {rid:02d}",
                "geom_wkt": f"POLYGON (({ring}))",
            })
    return pd.DataFrame(rows)


def write_fixtures(out_dir: str, seed: int = 42) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    frames = {
        "lu": make_lu(seed=seed),
        "lu_csv": make_lu_csv(),
        "landsat_pixels": make_landsat_pixels(seed=seed),
        "elevation_cells": make_elevation_cells(seed=seed),
        "admin_regions": make_admin_regions(),
    }
    paths = {}
    for name, pdf in frames.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        paths[name] = path
    return paths
