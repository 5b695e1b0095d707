"""Merged query/oracle registry backing the driver contract.

``__spark_entry__.queries()`` / ``oracle_sql()`` delegate here.  Modules
register into their own QUERIES/ORACLES dicts; this module merges them and
asserts name uniqueness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from .operators import relational

    mods = [relational]
    # Optional modules appear as they are built; keep imports independent so
    # one broken module never takes down the whole registry.
    for name in ("dedup", "similarity", "textops", "zonal", "multimodal",
                 "clustering"):
        try:
            mod = __import__(
                f"{__package__}.operators.{name}", fromlist=[name]
            )
            mods.append(mod)
        except ImportError:
            pass
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict = {}
    for mod in _modules():
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
