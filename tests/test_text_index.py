"""Build/serve split for the persisted lexical BM25 index
(operators/text_index.py): postings + docfreq parquet + exact-integer
corpus stats in a manifest, probed without ever touching the documents
table. Contracts:

- probe-after-reload is BIT-IDENTICAL to the direct bm25_topk path
  (shared scoring tail + exact stats re-derivation)
- the probe plan scans only index artifacts, with the terms filter
  pushed into the postings scan
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE

TERMS = ("hash", "merge", "scan")


def _plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def docs(spark):
    from redpanda_ais_demo_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    from redpanda_ais_demo_spark.operators import text_index

    d = str(tmp_path_factory.mktemp("lex") / "idx")
    man = text_index.lexical_build(docs, d)
    assert man["n_docs"] == docs.count()
    return d


def test_probe_matches_direct_bit_for_bit(spark, docs, idx):
    from redpanda_ais_demo_spark.operators import retrieval, text_index

    direct = retrieval.bm25_topk(docs, TERMS, k=10).collect()
    probed = text_index.bm25_probe(spark, idx, TERMS, k=10).collect()
    assert [tuple(r) for r in probed] == [tuple(r) for r in direct]


def test_probe_plan_never_scans_documents(spark, idx):
    from redpanda_ais_demo_spark.operators import text_index

    df = text_index.bm25_probe(spark, idx, TERMS, k=10)
    plan = _plan(df)
    assert "documents.parquet" not in plan
    # the query-vocabulary restriction reaches the postings parquet scan
    assert "PushedFilters" in plan and ("In(t" in plan or "t IN" in plan)


def test_probe_rejects_wrong_index_kind(spark, docs, tmp_path):
    from redpanda_ais_demo_spark.operators import ann_index, text_index
    from redpanda_ais_demo_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "pq")
    ann_index.pq_build(emb, d)
    with pytest.raises(ValueError, match="not lexical_bm25"):
        text_index.bm25_probe(spark, d, TERMS)


def test_avgdl_re_derivation_is_exact(docs, idx):
    """manifest total_tokens/n_docs must equal F.avg's double exactly —
    the literal both scoring paths bake into the plan."""
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.functions import text as T
    from redpanda_ais_demo_spark.operators.ann_index import read_manifest

    m = read_manifest(idx)
    direct = docs.agg(F.avg(F.size(T.tokens(F.col("text"))))).collect()[0][0]
    assert m["total_tokens"] / m["n_docs"] == direct
