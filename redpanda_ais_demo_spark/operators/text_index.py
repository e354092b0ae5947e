"""Persisted lexical (inverted) index for BM25 — the build/serve split
for full-text retrieval, mirroring ann_index.py's PQ/IVF artifacts on
the vector side. A real 100 TB pipeline tokenizes the corpus once in a
nightly build and answers every query thereafter from the postings
alone; ``retrieval.bm25_topk`` re-tokenizes per call, which is correct
but pays the corpus scan every time.

Artifacts under ``index_dir``:
- ``postings/``  parquet (t, id, tf, dl), repartitioned + sorted by
  term so parquet row-group min/max stats prune non-query terms — a
  probe for 3 terms reads a vanishing fraction of the index.
- ``docfreq/``   parquet (t, df) — the vocabulary-sized idf input.
- ``manifest.json`` — format version + exact corpus stats (n_docs,
  total_tokens as BIGINTs; avgdl re-derives as ONE division, bit-equal
  to the direct path's ``F.avg``).

Probe-vs-direct bit-equality holds because both paths literalize the
same (n_docs, avgdl) scalars and end in the SAME scoring expression
tree (``retrieval.bm25_score_topk``); pinned by tests/test_text_index.py,
which also pins that the probe plan never scans the documents table.

The reference has no text-retrieval surface (SURVEY.md §2.11 —
extension per the BASELINE.json north star).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from . import retrieval
from .ann_index import FORMAT_VERSION, _write_manifest, read_manifest


def lexical_build(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Tokenize the corpus once and persist the inverted index. One
    corpus scan feeds both the postings aggregation (shuffle carries
    one row per distinct (term, doc) after partial agg) and the 2-scalar
    stats job; docfreq derives from the postings, never a second pass.
    Returns the manifest dict.
    """
    base = docs.select(F.col(id_col).alias("id"), T.tokens(F.col(text_col)).alias("w"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("w")).cast("long").alias("total_tokens"),
    ).collect()[0]
    postings = (
        base.select("id", F.size("w").alias("dl"), F.explode("w").alias("t"))
        .groupBy("t", "id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    # term-major layout: row-group stats on t make the probe's IN-filter
    # prune everything outside the query vocabulary
    postings.repartition("t").sortWithinPartitions("t", "id").write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "postings"))
    spark = docs.sparkSession
    spark.read.parquet(os.path.join(index_dir, "postings")).groupBy("t").agg(
        F.count("*").alias("df")
    ).repartition(1).sortWithinPartitions("t").write.mode("overwrite").parquet(
        os.path.join(index_dir, "docfreq")
    )
    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": "lexical_bm25",
        "n_docs": int(stats.n_docs),
        "total_tokens": int(stats.total_tokens),
        "id_col": id_col,
    }
    _write_manifest(index_dir, manifest)
    return manifest


def bm25_probe(
    spark: SparkSession,
    index_dir: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-``k`` served from the persisted index — never touches the
    raw documents. The terms filter lands in the parquet scan
    (PushedFilters: In(t, ...)), so the corpus-side read is postings of
    the query terms only; docfreq is vocabulary-sized and broadcast.

    avgdl re-derives from the manifest's exact integer stats with one
    float division — the same IEEE double the direct path's ``F.avg``
    produces (integer-valued partial sums below 2^53 are exact), so
    probe and direct results are bit-identical.
    """
    m = read_manifest(index_dir)
    if m.get("kind") != "lexical_bm25":
        raise ValueError(f"index at {index_dir} is {m.get('kind')}, not lexical_bm25")
    n_docs = m["n_docs"]
    avgdl = m["total_tokens"] / n_docs
    terms = list(terms)
    tf = spark.read.parquet(os.path.join(index_dir, "postings")).filter(
        F.col("t").isin(terms)
    )
    dfreq = spark.read.parquet(os.path.join(index_dir, "docfreq")).filter(
        F.col("t").isin(terms)
    )
    return retrieval.bm25_score_topk(
        tf, dfreq, n_docs, avgdl, k, k1, b, m.get("id_col", "doc_id")
    )
