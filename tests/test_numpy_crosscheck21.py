"""Twenty-first batch of independent cross-checks — the geometry
pipeline and the redactor, the last oracled queries without a third
way: q61 zonal histogram (grid join + zonal mean + binning from raw
arithmetic), q62 dissolve area (the union/area kernel on disjoint
boxes), q67 overlap dissolve (the union kernel on OVERLAPPING boxes,
checked against interval-merging — the pure-Python union of rectangles
is computed by island sweep, so the planar-subdivision kernel's area is
verified with no geometry code shared), q90 pattern redaction (Python
re against Spark's Java regex).  After this batch every oracled query
has an independent recomputation except the six approx/ANN queries
whose contracts are bounded-error by design (test_approx/test_ann).
Same contract: pure Python from parquet, no Spark, no DuckDB.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


def _close(a, b):
    return abs(a - b) <= max(abs(b) * 1e-9, TOL)


def _t(name, cols=None):
    return pd.read_parquet(f"{SF_ORACLE}/{name}.parquet", columns=cols)


# -------------------------------------------------------------- q61
def test_q61_zonal_histogram_vs_arithmetic(spark):
    from spatial_data_engineering_spark.operators.zonal import (
        q61_zonal_histogram)

    p = _t("part", ["p_partkey"])
    zones = defaultdict(list)
    for k in p.p_partkey:
        x = ((k * 13) % 1000) / 10.0 + 0.05
        y = ((k * 29) % 1000) / 10.0 + 0.05
        elev = ((k * 7) % 700) + 0.5
        zones[int(y // 20) * 5 + int(x // 20)].append(elev)
    bins = Counter(int((sum(v) / len(v)) // 20) for v in zones.values())
    got = {r.bin: r.frequency
           for r in q61_zonal_histogram(spark, SF_ORACLE).collect()}
    assert got == dict(bins)


# -------------------------------------------------------------- q62
def test_q62_dissolve_area_vs_arithmetic(spark):
    from spatial_data_engineering_spark.operators.zonal import (
        q62_dissolve_area)

    n = _t("nation", ["n_nationkey", "n_regionkey"])
    grp = defaultdict(list)
    for nk, rk in zip(n.n_nationkey, n.n_regionkey):
        side = 20.0 - 2 * ((nk % 7) * 0.5)
        grp[rk].append(side * side)  # boxes are disjoint across nations
    got = {r.n_regionkey: (r.area_ha, r.n_parts)
           for r in q62_dissolve_area(spark, SF_ORACLE).collect()}
    assert set(got) == set(grp)
    for rk, areas in grp.items():
        assert _close(got[rk][0], sum(areas) / 10000.0)
        assert got[rk][1] == len(areas)


# -------------------------------------------------------------- q67
def test_q67_overlap_dissolve_vs_interval_merge(spark):
    from spatial_data_engineering_spark.operators.zonal import (
        q67_overlap_dissolve)

    n = _t("nation", ["n_nationkey", "n_regionkey"])
    intervals = defaultdict(list)
    for nk, rk in zip(n.n_nationkey, n.n_regionkey):
        x0 = float((nk * 17) % 40)
        intervals[rk].append((x0, x0 + 25.0))
    got = {r.n_regionkey: (r.union_area, r.n_islands)
           for r in q67_overlap_dissolve(spark, SF_ORACLE).collect()}
    assert set(got) == set(intervals)
    for rk, ivs in intervals.items():
        ivs.sort()
        islands = []
        for a, b in ivs:
            if islands and a <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], b)
            else:
                islands.append([a, b])
        height = rk + 5.0
        area = round(sum(b - a for a, b in islands) * height, 6)
        assert _close(got[rk][0], area)
        assert got[rk][1] == len(islands)


# -------------------------------------------------------------- q90
def test_q90_pattern_redact_vs_python_re(spark):
    from spatial_data_engineering_spark.operators.textops import (
        q90_pattern_redact)

    docs = _t("documents", ["doc_id", "text"])
    pats = [r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            r"[0-9]{6,}", r"customer( customer)*"]
    expected = {}
    for d, txt in zip(docs.doc_id, docs.text):
        counts = [len(re.findall(p, txt)) for p in pats]
        if sum(counts) == 0:
            continue
        red = txt
        for p in pats:
            red = re.sub(p, "[REDACTED]", red)
        expected[d] = (*counts,
                       hashlib.md5(red.encode()).hexdigest())
    got = {r.doc_id: (r.n_email, r.n_digits, r.n_entity, r.redacted_md5)
           for r in q90_pattern_redact(spark, SF_ORACLE).collect()}
    assert got == expected
