"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the declared-query registry
(``redpanda_ais_demo_spark/plans/registry.py``), which wires every
implemented operator from SURVEY.md §2 to a Spark callable and (where
SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from redpanda_ais_demo_spark.dist import ensure_shipped  # noqa: E402
from redpanda_ais_demo_spark.plans import get_oracles, get_queries  # noqa: E402


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    # The driver builds its own SparkSession with an arbitrary cwd; ship the
    # package to its Python workers before any pandas-UDF operator runs.
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (J1 dashboard join) on /root/testdata/sf0.001."""
    return _wrap(get_queries()["j1_dashboard_join"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in get_queries().items()}


def oracle_sql() -> dict[str, str]:
    return get_oracles()
