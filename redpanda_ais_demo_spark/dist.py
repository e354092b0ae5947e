"""Ship this package to Spark Python workers.

Any operator that runs Python on executors (mapInPandas / pandas UDFs)
needs the package importable there. The host session may have been built
by a third party (the driver) with an arbitrary cwd and no PYTHONPATH to
this repo, so we zip the package once and ``addPyFile`` it — the
cluster-correct mechanism (works identically on local and multi-node).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
_MARKER = "_redpanda_ais_demo_spark_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _MARKER, False):
        return
    zip_path = os.path.join(tempfile.gettempdir(), f"{_PKG_NAME}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _MARKER, True)
