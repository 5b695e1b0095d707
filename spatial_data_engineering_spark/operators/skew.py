"""Skew mitigation utilities (salt the hot
key; SURVEY.md §4 spill/skew row).

AQE's skew-join splitting handles most cases automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py).  ``salted_join``
is the manual technique for when the build side must replicate: the probe
side's hot keys spread across n_salt sub-partitions, the build side
replicates once per salt, and the join key becomes (key, salt) — turning
one straggler partition into n_salt even ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join on ``key`` with an n_salt-way salt.

    left is the large/skewed side (salt assigned pseudo-randomly but
    deterministically from a row hash); right is replicated n_salt times.
    Result equals ``left.join(right, key, how)`` row-for-row for join
    types where unmatched RIGHT rows don't survive — right/full outer
    would emit one null-extended row per salt replica and are rejected.
    """
    normalized = how.lower().replace("_", "")
    if normalized not in ("inner", "left", "leftouter", "semi", "leftsemi",
                          "anti", "leftanti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "right side would duplicate unmatched right rows n_salt times")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("salted_join: inputs must not contain a column "
                         "named '__salt'")
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(n_salt))
    )
    salt_range = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>")
    )
    salted_r = right.withColumn("__salt", salt_range)
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")
