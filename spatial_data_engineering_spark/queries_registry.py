"""Merged query/oracle registry backing the driver contract.

``__spark_entry__.queries()`` / ``oracle_sql()`` delegate here.  Modules
register into their own QUERIES/ORACLES dicts; this module merges them and
asserts name uniqueness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    # Imports are deliberately LOUD: a broken module must fail the whole
    # registry, not silently shrink the inventory — the parity gate
    # parametrizes over whatever this returns, so a swallowed ImportError
    # would turn missing queries into a false-green run.
    from .operators import (clustering, dedup, multimodal, relational,
                            similarity, textops, zonal)

    return [relational, dedup, similarity, textops, zonal, multimodal,
            clustering]


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
        for name, sql in mod.ORACLES.items():
            if name in out:
                raise ValueError(f"duplicate oracle name {name!r}")
            out[name] = sql
    return out
