"""Build/serve split for persisted ANN indexes (operators/ann_index.py):
a PQ or IVF index is built ONCE as parquet + manifest, and probes load
the artifacts without ever touching the raw embeddings table. The two
contract tests the design hangs on:

- probe-after-reload is BIT-IDENTICAL to the in-memory ADC path
- the probe plan scans only index artifacts (PQ: codes/; IVF: exactly
  the n_probe pruned list partitions)
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import SF_SMOKE


def _plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def emb(spark):
    from redpanda_ais_demo_spark.sources import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


def test_pq_probe_after_reload_matches_in_memory_bit_for_bit(spark, emb, tmp_path):
    from redpanda_ais_demo_spark.operators import ann_index, similarity

    idx = str(tmp_path / "pq_idx")
    man = ann_index.pq_build(emb, idx)
    assert man["count"] == emb.count() and man["dim"] == 64

    probed = ann_index.pq_probe(spark, idx, emb, k=5).collect()
    in_mem = similarity.pq_topk(emb, k=5, rerank=0).collect()
    key = lambda r: (r.vec_id, r.rank)
    got = {key(r): (r.neighbor_id, r.approx_sim) for r in probed}
    want = {key(r): (r.neighbor_id, r.approx_sim) for r in in_mem}
    assert got == want  # bit-for-bit: same neighbor, same float

    # rebuild reproduces the index byte-for-byte at the logical level
    idx2 = str(tmp_path / "pq_idx2")
    ann_index.pq_build(emb, idx2)
    b1 = ann_index.pq_load_codebooks(idx)
    b2 = ann_index.pq_load_codebooks(idx2)
    assert np.array_equal(b1, b2)


def test_pq_probe_plan_never_scans_embeddings_table(spark, emb, tmp_path):
    from redpanda_ais_demo_spark.operators import ann_index

    idx = str(tmp_path / "pq_idx")
    ann_index.pq_build(emb, idx)
    # queries arrive as literal vectors — the only FileScan allowed is codes/
    q = spark.createDataFrame(
        [(10_000 + i, [float((i * 7 + j) % 13) for j in range(64)]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    probe = ann_index.pq_probe(spark, idx, q, k=3)
    plan = _plan(probe)
    assert "embeddings.parquet" not in plan
    assert "codes" in plan
    rows = probe.collect()
    assert {r.vec_id for r in rows} == {10_000, 10_001, 10_002}
    assert all(1 <= r.rank <= 3 for r in rows)


def test_manifest_versioning_rejects_unknown_format(spark, emb, tmp_path):
    import json
    import os

    from redpanda_ais_demo_spark.operators import ann_index

    idx = str(tmp_path / "pq_idx")
    ann_index.pq_build(emb, idx)
    man = json.load(open(os.path.join(idx, "manifest.json")))
    man["format_version"] = 999
    json.dump(man, open(os.path.join(idx, "manifest.json"), "w"))
    with pytest.raises(ValueError, match="format_version"):
        ann_index.pq_load_codebooks(idx)


def test_ivf_probe_prunes_to_probed_list_partitions(spark, emb, tmp_path):
    from redpanda_ais_demo_spark.operators import ann_index

    idx = str(tmp_path / "ivf_idx")
    man = ann_index.ivf_build(emb, idx, n_centroids=8)
    assert man["count"] == emb.count()

    qvec = [float(j % 5) for j in range(64)]
    probe = ann_index.ivf_probe(spark, idx, qvec, k=5, n_probe=2)
    plan = _plan(probe)
    assert "embeddings.parquet" not in plan
    # the list_id IN (...) filter must land as parquet PARTITION pruning,
    # not a post-scan filter
    assert "PartitionFilters" in plan and "list_id" in plan

    rows = probe.collect()
    assert len(rows) == 5 and [r.rank for r in rows] == [1, 2, 3, 4, 5]

    # exactness within the probed lists: re-score the same candidate set
    # with the exact single-query primitive and compare
    cents = ann_index.ivf_load_centroids(idx)
    q = np.asarray(qvec)
    probes = np.argsort(-(cents @ (q / np.linalg.norm(q))))[:2].tolist()
    import os

    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators import retrieval

    lists = (
        spark.read.parquet(os.path.join(idx, "lists"))
        .filter(F.col("list_id").isin(probes))
        .select(F.col("id").alias("vec_id"), F.col("v").alias("embedding"))
    )
    want = retrieval.query_cosine_topk(lists, qvec, k=5).collect()
    assert [(r.vec_id, r.cos_sim) for r in rows] == [
        (r.vec_id, r.cos_sim) for r in want
    ]


def test_ivf_probe_validates_query(spark, emb, tmp_path):
    from redpanda_ais_demo_spark.operators import ann_index

    idx = str(tmp_path / "ivf_idx")
    ann_index.ivf_build(emb, idx, n_centroids=4)
    with pytest.raises(ValueError, match="query dim"):
        ann_index.ivf_probe(spark, idx, [1.0] * 16)
    with pytest.raises(ValueError, match="zero norm"):
        ann_index.ivf_probe(spark, idx, [0.0] * 64)


def test_pq_append_encodes_with_frozen_codebooks(spark, emb, tmp_path):
    """Incremental maintenance: vectors appended later are encoded with
    the PERSISTED codebooks (bit-equal to pq_encode with those books),
    the manifest count updates, and probes see the appended ids."""
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators import ann_index, similarity

    idx = str(tmp_path / "pq_idx")
    first = emb.filter(F.col("vec_id") < 250)
    rest = emb.filter(F.col("vec_id") >= 250)
    ann_index.pq_build(first, idx)
    man = ann_index.pq_append(rest, idx)
    assert man["count"] == emb.count()

    books = ann_index.pq_load_codebooks(idx)
    import os

    stored = {
        r.id: list(r.codes)
        for r in spark.read.parquet(os.path.join(idx, "codes"))
        .filter(F.col("id") >= 250)
        .collect()
    }
    fresh = {
        r.id: list(r.codes)
        for r in similarity.pq_encode(rest, books).collect()
    }
    assert stored == fresh  # frozen-codebook encoding, bit-equal

    probed = ann_index.pq_probe(spark, idx, emb.filter(F.col("vec_id") == 0), k=400)
    assert any(r.neighbor_id >= 250 for r in probed.collect())

    with pytest.raises(ValueError, match="pq index"):
        ivf = str(tmp_path / "ivf_idx")
        ann_index.ivf_build(emb, ivf, n_centroids=4)
        ann_index.pq_append(rest, ivf)


def test_ivfpq_probe_matches_numpy_adc_on_pruned_lists(spark, emb, tmp_path):
    """The composed IVF-PQ index: probe plan prunes to n_probe list
    partitions, and the expression-side ADC scores (literal LUT +
    element_at adds) equal a numpy replay over the same pruned codes
    bit-for-bit."""
    import os

    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators import ann_index

    idx = str(tmp_path / "ivfpq_idx")
    man = ann_index.ivfpq_build(emb, idx, n_centroids=8)
    assert man["count"] == emb.count() and man["kind"] == "ivfpq"

    qvec = [float((j * 3) % 7) for j in range(64)]
    probe = ann_index.ivfpq_probe(spark, idx, qvec, k=10, n_probe=3)
    plan = _plan(probe)
    assert "embeddings.parquet" not in plan
    assert "PartitionFilters" in plan and "list_id" in plan
    rows = probe.collect()
    assert len(rows) == 10

    cents = ann_index.ivf_load_centroids(idx)
    books = ann_index.pq_load_codebooks(idx)
    q = np.asarray(qvec)
    qn = q / np.linalg.norm(q)
    probes = np.argsort(-(cents @ qn))[:3].tolist()
    mm, _, dsub = books.shape
    lut = np.einsum("jd,jcd->jc", qn.reshape(mm, dsub), books)
    pruned = (
        spark.read.parquet(os.path.join(idx, "lists"))
        .filter(F.col("list_id").isin(probes))
        .collect()
    )
    sims = {}
    for r in pruned:
        sims[r.id] = round(float(sum(lut[j, r.codes[j]] for j in range(mm))), 6)
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.vec_id, r.approx_sim) for r in rows] == want
