"""Local replica of the driver's correctness gate: run a registry query on
Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare (column names sorted, row order insensitive, exact values).

Stricter than the driver (exact equality, zero float tolerance): every
declared query is engineered to be bit-deterministic cross-engine
(see plans/registry.py docstring), so exactness is achievable and anything
less hides drift.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    sp, du = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(sp.columns) == list(du.columns), f"{name}: columns {list(sp.columns)} != {list(du.columns)}"
    # dtype-kind parity (int vs float vs object) — a proxy for the driver's
    # schema check; int32-vs-int64 width differences are tolerated.
    for c in sp.columns:
        ka = spark_pdf[sorted(spark_pdf.columns)][c].dtype.kind
        kb = duck_pdf[sorted(duck_pdf.columns)][c].dtype.kind
        assert ka == kb, f"{name}: dtype kind mismatch on {c}: spark={ka} duck={kb}"
    assert len(sp) == len(du), f"{name}: row count {len(sp)} != {len(du)}"
    for c in sp.columns:
        a, b = sp[c].to_numpy(), du[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            af, bf = a.astype(float), b.astype(float)
            both_nan = pd.isna(af) & pd.isna(bf)
            # signbit check: np.isclose(0.0, -0.0) is True, but the
            # driver hashes string forms where '0.0' != '-0.0' — a
            # DuckDB round() emitting -0.0 must FAIL here, not pass
            # (bit uplift_qini's first window rehearsal in r12)
            ok = (
                np.isclose(af, bf, rtol=0, atol=0)
                & (np.signbit(af) == np.signbit(bf))
            ) | both_nan
        else:
            ok = (a == b) | (pd.isna(a) & pd.isna(b))
        if not ok.all():
            idx = int(np.argmin(ok))
            raise AssertionError(
                f"{name}: column {c} mismatch at sorted-row {idx}: spark={a[idx]!r} duck={b[idx]!r}"
            )


def check_query(spark, name: str, sf_dir: str) -> None:
    from redpanda_ais_demo_spark.plans import REGISTRY, get_queries

    get_queries()
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    assert spec.oracle is not None, f"{name} has no oracle"
    duck_pdf = run_duckdb(spec.oracle, sf_dir)
    assert_frames_match(spark_pdf, duck_pdf, name)
