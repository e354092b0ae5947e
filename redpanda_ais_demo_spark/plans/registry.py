"""Declared-query registry — the single source of truth wiring every
implemented operator to (a) a Spark callable and (b) a DuckDB oracle SQL
string. ``__spark_entry__.py`` exposes this to the driver.

Determinism rules every entry follows (so the oracle value-hash matches):
- Money/measure aggregates sum exact integer "cents" (values are 2-decimal
  by construction) and divide once at the end — identical IEEE doubles on
  both engines, no FP-associativity drift from Spark's partial aggregation.
- Timestamps are emitted as formatted strings or epoch longs, never raw
  (parquet ns vs Spark µs precision).
- Every LIMIT is preceded by a total ORDER BY (unordered LIMIT is a
  nondeterministic subset; SURVEY.md §7 risk 5).
- Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under ``name``."""

    def wrap(fn):
        if name in REGISTRY and REGISTRY[name].fn is not fn:
            raise ValueError(f"duplicate declared-query name: {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all() -> None:
    # Import side-effect registration; kept lazy so a syntax error in one
    # module is visible at call time, not package import time.
    from . import ais_queries, tpch_queries, tpch_ext_queries, llm_queries, advanced_queries  # noqa: F401


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
