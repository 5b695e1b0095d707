"""Pins for the cross-engine float divergences the round-11 sf1 parity
sweep exposed (SCALE_NOTES "oracle parity re-proven at sf1").  These
tests document the traps on MINIMAL inputs so the patterns can't
silently regress or be reintroduced by a future oracle:

1. ROUND halfway semantics: Spark rounds the double's shortest decimal
   repr, DuckDB the binary value — divergent on .5e-6 boundaries.
   The floor-device floor(x*1e6 + 0.5)/1e6 agrees everywhere.
2. quantile_cont lerps blindly (k*(1-f) + k*f != k in FP) where Spark's
   exact percentile short-circuits equal endpoints; common.sql_spark_pct
   replicates Spark bit for bit (every oracle percentile uses it).
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

# doc 876's quality lands exactly on a .5e-6 boundary: the real sf1 row
# that caught divergence (binary double 0.5046874999999999...).
HALFWAY = 0.5046875


def test_round_halfway_diverges_and_floor_device_agrees(spark):
    s_round, s_floor = spark.range(1).select(
        F.round(F.lit(HALFWAY), 6).alias("r"),
        (F.floor(F.lit(HALFWAY) * 1000000.0 + 0.5) / 1000000.0).alias("f")
    ).first()
    d_round, d_floor = duckdb.sql(
        f"SELECT ROUND(CAST({HALFWAY!r} AS DOUBLE), 6), "
        f"floor(CAST({HALFWAY!r} AS DOUBLE) * 1000000.0 + 0.5) "
        f"/ 1000000.0").fetchone()
    # the trap, pinned: the engines' ROUNDs disagree on this value
    assert s_round == 0.504688 and d_round == 0.504687
    # the fix: identical plain-IEEE arithmetic agrees (and matches the
    # binary-value side — floor sees 0.50468749999999994 < .5 halfway)
    assert s_floor == d_floor == 0.504687


def test_quantile_cont_equal_endpoints_off_by_ulp():
    # 4 values; p90 pos = 0.9*3 = 2.7 interpolates between sorted[2] and
    # sorted[3], both 0.473512 — quantile_cont returns a value NOT
    # PRESENT in the data (one ulp high), because k*(1-f)+k*f != k
    (got,) = duckdb.sql(
        "SELECT quantile_cont(x, CAST(0.9 AS DOUBLE)) FROM (VALUES "
        "(0.1::DOUBLE), (0.473512), (0.473512), (0.473512)) t(x)"
    ).fetchone()
    assert got == 0.47351200000000004
    assert got != 0.473512


def _pct_via_sql_spark_pct(vals, prob, part=False):
    from spatial_data_engineering_spark.operators.common import \
        sql_spark_pct
    con = duckdb.connect()
    rows = ", ".join("(NULL)" if v is None else f"({v})" for v in vals)
    con.sql(f"CREATE VIEW src AS SELECT 's' AS source, "
            f"CAST(x AS DOUBLE) AS q FROM (VALUES {rows}) t(x)")
    cte = sql_spark_pct("src", "q", [(prob, "p")],
                        part=["source"] if part else None)
    return con.sql(f"WITH {cte} SELECT p FROM pct").fetchone()[0]


def test_sql_spark_pct_matches_spark_percentile(spark):
    # same 4 values: Spark's exact percentile short-circuits the equal
    # endpoints; the oracle generator must reproduce that, where
    # quantile_cont (above) drifts
    vals = [0.1, 0.473512, 0.473512, 0.473512]
    (sp,) = (spark.createDataFrame([(v,) for v in vals], "q double")
             .agg(F.percentile("q", F.lit(0.9))).first())
    assert sp == 0.473512
    for part in (False, True):
        assert _pct_via_sql_spark_pct(vals, "0.9", part) == sp


def test_sql_spark_pct_ignores_nulls_like_spark(spark):
    # ADVICE r11: Spark's percentile() IGNORES NULLs; the ranked CTE must
    # filter them out before ROW_NUMBER/COUNT(*) OVER or every position
    # shifts (DuckDB orders NULLS LAST, so they'd inflate __n and park at
    # the top ranks).  Pin on a nullable column where the NULL-counting
    # bug changes both the interpolation index and the endpoint values.
    vals = [0.1, None, 0.3, 0.5, None, 0.9]
    (sp,) = (spark.createDataFrame([(v,) for v in vals], "q double")
             .agg(F.percentile("q", F.lit(0.75))).first())
    assert sp == 0.6  # over the 4 non-null values: pos=2.25 -> 0.5..0.9
    for part in (False, True):
        assert _pct_via_sql_spark_pct(vals, "0.75", part) == sp


def test_sql_spark_pct_matches_spark_on_distinct_endpoints(spark):
    # distinct endpoints: the two-weight form itself must match Spark's
    # bits (this is where the naive lo + (hi-lo)*frac form drifted)
    vals = [0.402557, 0.457202, 0.490741, 0.497102, 0.549511]
    (sp,) = (spark.createDataFrame([(v,) for v in vals], "q double")
             .agg(F.percentile("q", F.lit(0.9))).first())
    for part in (False, True):
        assert _pct_via_sql_spark_pct(vals, "0.9", part) == sp


def _pct_two_groups(vals_by_group, prob, keep_null_groups):
    """sql_spark_pct over a two-group relation; returns {group: p}."""
    from spatial_data_engineering_spark.operators.common import \
        sql_spark_pct
    con = duckdb.connect()
    rows = ", ".join(
        f"('{g}', {'NULL' if v is None else v})"
        for g, vs in vals_by_group.items() for v in vs)
    con.sql(f"CREATE VIEW src AS SELECT g, CAST(x AS DOUBLE) AS q "
            f"FROM (VALUES {rows}) t(g, x)")
    cte = sql_spark_pct("src", "q", [(prob, "p")], part=["g"],
                        keep_null_groups=keep_null_groups)
    return dict(con.sql(f"WITH {cte} SELECT g, p FROM pct").fetchall())


def test_sql_spark_pct_all_null_group_contract(spark):
    # ADVICE r12: the helper's residual cross-engine divergence is the
    # ALL-null group — Spark's groupBy emits it with a NULL percentile,
    # the default oracle mode drops it.  Pin BOTH sides of the contract:
    # (1) the default mode's documented drop (executable knowledge of
    # the caveat callers must design around), (2) keep_null_groups=True
    # restores the group with NULL, matching Spark, without moving any
    # value in groups that have data.
    data = {"a": [0.1, 0.3, None, 0.9], "b": [None, None, None]}
    sp = dict(
        spark.createDataFrame(
            [(g, v) for g, vs in data.items() for v in vs],
            "g string, q double")
        .groupBy("g").agg(F.percentile("q", F.lit(0.75)).alias("p"))
        .collect())
    assert set(sp) == {"a", "b"} and sp["b"] is None

    default = _pct_two_groups(data, "0.75", keep_null_groups=False)
    assert set(default) == {"a"}  # the documented drop
    assert default["a"] == sp["a"]

    kept = _pct_two_groups(data, "0.75", keep_null_groups=True)
    assert set(kept) == {"a", "b"}  # group survives, like Spark
    assert kept["a"] == sp["a"] and kept["b"] is None


def test_sql_spark_pct_keep_null_groups_text_default_unchanged():
    # the opt-in must not perturb the 13 shipped oracle strings: the
    # default-mode text is byte-identical with the flag absent or False
    from spatial_data_engineering_spark.operators.common import \
        sql_spark_pct
    a = sql_spark_pct("t", "v", [("0.5", "m")], part=["g"])
    b = sql_spark_pct("t", "v", [("0.5", "m")], part=["g"],
                      keep_null_groups=False)
    assert a == b
