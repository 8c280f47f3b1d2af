"""Query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 gets a named query
``(spark, sf_dir) -> DataFrame`` and — when SQL-expressible — a matching
DuckDB oracle string over the same parquet tables. Column names are
aliased identically on both sides (the driver's compare sorts columns by
name before value-hashing).

Cross-engine determinism rules used throughout (see tests/test_queries.py
which pre-runs the driver's comparison):

- double SUMs are computed as ``SUM(CAST(x AS DECIMAL(30,8)))`` then cast
  back to double: decimal addition is exact and order-independent, so
  Spark's and DuckDB's different accumulation orders cannot diverge;
- averages are derived as exact-decimal-sum / count in double;
- LIMIT/top-k and window ranks always order by a UNIQUE key suffix;
- timestamps are emitted as formatted strings (tz-representation-proof);
- float vector math is quantized to integers before reduction.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a driver-contract query; ``oracle=None`` -> rows-only check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
