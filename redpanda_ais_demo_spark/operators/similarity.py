"""Similarity search over embedding columns (array<float>).

Two paths, per the scale doctrine:
- ``brute_force_topk`` — exact all-pairs cosine via 2-D block sharding
  (block nested loop): both sides split into √P-ish shards, every
  (query-shard × corpus-shard) block scores one numpy matmul, per-block
  top-k merges through a narrow window. Nothing ever collects to the
  driver; executor memory holds one shard per side. The right exact plan
  at any corpus size the O(n²) compute itself can afford.
- ``lsh_topk`` — random-hyperplane LSH bucketing: each vector lands in
  L hash-table buckets; only same-bucket pairs are scored. Candidate
  generation is linear in corpus size — the 100 TB path (IVF-style
  coarse quantization would slot in the same join shape).

Dot products run JVM-side via higher-order functions (functions/vector.py)
— sequential, bit-deterministic, oracle-comparable.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOPK_SCHEMA = "vec_id long, neighbor_id long, cos_sim double, rank long"


# explicit DataType (not DDL string): importable without an active SparkContext
@F.pandas_udf(T.DoubleType())
def cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized pairwise cosine for candidate re-scoring: one
    einsum per batch instead of per-element expression interpretation."""
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(np.einsum("ij,ij->i", B, B))
    return pd.Series(num / den)


def _block_grid(
    embeddings: DataFrame, id_col: str, vec_col: str, n_shards: int | None
):
    """2-D block decomposition for exact all-pairs scoring.

    Every id owns one query-shard ``qs`` and one corpus-shard ``cs``
    (both = pmod(xxhash64(id), s), uniform by hashing). The query side
    replicates each row across all ``cs`` values, the corpus side across
    all ``qs`` values, so block (i, j) holds exactly query-shard i and
    corpus-shard j — each (query, corpus) ordered pair meets in exactly
    one block. Shuffle volume is 2·s·n rows (linear in the corpus); the
    O(n²) dot products stay inside per-block numpy. Executor memory per
    task is one shard per side, ~2·n/s vectors — pick ``n_shards`` so
    that fits; s² blocks give the scheduler plenty of parallelism.
    """
    if n_shards is None:
        par = embeddings.sparkSession.sparkContext.defaultParallelism
        n_shards = max(2, math.isqrt(max(par - 1, 0)) + 1)  # s² >= parallelism
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    own = F.pmod(F.xxhash64(F.col("id")), F.lit(n_shards)).cast("int")
    all_shards = F.explode(F.array(*[F.lit(i) for i in range(n_shards)]))
    queries = base.withColumn("qs", own).withColumn("cs", all_shards)
    corpus = base.withColumn("cs", own).withColumn("qs", all_shards)
    return queries.groupBy("qs", "cs").cogroup(corpus.groupBy("qs", "cs"))


def _block_sims(qpdf: pd.DataFrame, cpdf: pd.DataFrame):
    """Rounded cosine matrix (queries × corpus) for one block."""
    q_ids = qpdf["id"].to_numpy(dtype=np.int64)
    c_ids = cpdf["id"].to_numpy(dtype=np.int64)
    Q = np.stack(qpdf["v"].to_numpy()).astype(np.float64)
    C = np.stack(cpdf["v"].to_numpy()).astype(np.float64)
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    cn = np.sqrt(np.einsum("ij,ij->i", C, C))
    return q_ids, c_ids, np.round((Q @ C.T) / (qn[:, None] * cn[None, :]), 6)


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector — 2-D block-sharded design.

    ``_block_grid`` splits both sides into ``n_shards`` hash shards and
    cogroups every (query-shard × corpus-shard) block; each block scores
    one float64 matmul in numpy and emits only its local top-k per query
    (provably a superset of that block's global-top-k contributions: a
    neighbor's in-block rank never exceeds its global rank). A narrow
    (vec_id, neighbor_id, cos_sim) window merge takes the final top-k.
    No driver-side collect anywhere — the former broadcast-corpus variant
    OOMed the driver at scale; this plan's memory bound is per-executor
    and tunable via ``n_shards``.

    Output: (vec_id, neighbor_id, cos_sim rounded to 6dp, rank), at most
    min(k, n-1) rows per vector (self never emitted). Rounding +
    neighbor-id tiebreak make ranks deterministic and oracle-stable.
    """

    def block_topk(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "cos_sim": []}).astype(
                {"vec_id": np.int64, "neighbor_id": np.int64, "cos_sim": np.float64}
            )
        q_ids, c_ids, sims = _block_sims(qpdf, cpdf)
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf  # exclude self
        kk = min(k, sims.shape[1])
        out_vec, out_nbr, out_sim = [], [], []
        for i in range(len(q_ids)):
            order = np.lexsort((c_ids, -sims[i]))[:kk]  # sim desc, id asc tiebreak
            vals = sims[i][order]
            keep = vals > -np.inf
            out_vec.extend([q_ids[i]] * int(keep.sum()))
            out_nbr.extend(c_ids[order][keep])
            out_sim.extend(vals[keep])
        return pd.DataFrame(
            {
                "vec_id": np.asarray(out_vec, dtype=np.int64),
                "neighbor_id": np.asarray(out_nbr, dtype=np.int64),
                "cos_sim": np.asarray(out_sim, dtype=np.float64),
            }
        )

    local = _block_grid(embeddings, id_col, vec_col, n_shards).applyInPandas(
        block_topk, "vec_id long, neighbor_id long, cos_sim double"
    )
    # Each (query, neighbor) pair comes from exactly one block — no dedup
    # needed, just the global rank over ≤ n·k narrow rows.
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return local.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (X2 family): (id_a, id_b,
    cos_sim) with id_a < id_b and rounded cosine ≥ threshold.

    Exact verifier path on the same 2-D block grid as ``brute_force_topk``
    (no driver collect): each block masks ``q_id < c_id`` so every
    unordered pair is emitted exactly once across all blocks — the
    reverse orientation lands in a different block and fails the mask.
    The scale path generates candidates with ``lsh_topk`` buckets instead
    of the full matmul; thresholding on the 6dp-rounded value keeps the
    boundary bit-identical to the SQL oracle.
    """

    def block_dups(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "cos_sim": np.float64}
            )
        q_ids, c_ids, sims = _block_sims(qpdf, cpdf)
        hit_q, hit_c = np.nonzero((sims >= threshold) & (q_ids[:, None] < c_ids[None, :]))
        return pd.DataFrame(
            {
                "id_a": q_ids[hit_q],
                "id_b": c_ids[hit_c],
                "cos_sim": sims[hit_q, hit_c],
            }
        )

    return _block_grid(embeddings, id_col, vec_col, n_shards).applyInPandas(
        block_dups, "id_a long, id_b long, cos_sim double"
    )


def _kmeanspp_init(X: np.ndarray, n_centroids: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding on unit vectors (distance = 1 - cos): each next
    center is drawn proportionally to its distance from the chosen set,
    spreading seeds across the data instead of uniform luck."""
    n = len(X)
    centers = [X[rng.integers(n)]]
    d = 1.0 - X @ centers[0]
    for _ in range(min(n_centroids, n) - 1):
        p = np.clip(d, 1e-12, None)
        idx = rng.choice(n, p=p / p.sum())
        centers.append(X[idx])
        d = np.minimum(d, 1.0 - X @ centers[-1])
    return np.stack(centers)


def train_ivf_centroids_distributed(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 8,
    seed: int = 42,
    init_sample: int = 4096,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Full-corpus spherical k-means for IVF: k-means++ init on a bounded
    driver sample, then distributed Lloyd iterations — each pass assigns
    vectors to centroids executor-side (mapInPandas) and emits only one
    (per-centroid vector-sum, count) row per Arrow batch; the driver
    combines ~batches x n_centroids tiny rows and renormalizes. Driver
    memory is O(n_centroids x dim) regardless of corpus size, and every
    pass is a narrow full scan — the 100 TB training path (run it on a
    sampled fraction if even O(iters) scans is too dear; the index
    assignment step is unchanged either way).
    """
    spark = embeddings.sparkSession
    from ..dist import ensure_shipped

    ensure_shipped(spark)
    base = embeddings.select(vec_col)
    # lowest-id init sample: an unordered limit() would make the k-means++
    # seeds (hence centroids and list assignments) partitioning-dependent
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(init_sample)
        .select(vec_col)
        .toPandas()
    )
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    centroids = _kmeanspp_init(X, n_centroids, rng)
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(centroids)

        def partials(batches):
            C = bc.value
            for pdf in batches:
                V = np.stack(pdf.iloc[:, 0].to_numpy()).astype(np.float64)
                V = V / np.linalg.norm(V, axis=1, keepdims=True)
                assign = np.argmax(V @ C.T, axis=1)
                sums = np.zeros_like(C)
                np.add.at(sums, assign, V)
                counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "list_id": np.arange(len(C), dtype=np.int32),
                        "vsum": list(sums),
                        "n": counts,
                    }
                )

        agg = base.mapInPandas(partials, "list_id int, vsum array<double>, n long").toPandas()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for _, row in agg.iterrows():
            sums[row["list_id"]] += np.asarray(row["vsum"])
            counts[row["list_id"]] += row["n"]
        for c in range(len(centroids)):
            if counts[c]:
                norm = np.linalg.norm(sums[c])
                if norm > 0:
                    centroids[c] = sums[c] / norm
        bc.destroy()
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 8,
    sample_size: int = 4096,
    seed: int = 42,
    train: str = "sample",
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF coarse quantization.

    Train: sample ≤``sample_size`` vectors to the driver, run a few
    spherical k-means iterations in numpy, broadcast the centroids
    (n_centroids × dim — tiny at any corpus scale).
    Index: one narrow pass assigns each corpus vector to its nearest
    centroid (list id). Search: each query probes its ``n_probe`` nearest
    centroids; candidates = corpus vectors in those lists (a shuffle join
    on list id); exact cosine re-scores candidates.

    Scan fraction ≈ n_probe / n_centroids of the corpus per query —
    the knob that trades recall for cost. On clustered real-world
    embeddings recall is near-1 at small n_probe; on uniform random data
    (the fixture) recall ≈ scan fraction + ε. Same output schema as
    ``brute_force_topk``.

    ``train="sample"`` runs Lloyd iterations on a ≤``sample_size`` driver
    sample (cheap, fine when the sample captures the cluster structure);
    ``train="distributed"`` trains on the full corpus with k-means++ init
    and executor-side partial sums (``train_ivf_centroids_distributed``)
    — O(iters) extra scans, the right call on skewed corpora too large
    to sample representatively.
    """
    spark = embeddings.sparkSession
    from ..dist import ensure_shipped

    ensure_shipped(spark)
    base = embeddings.select(id_col, vec_col)
    if train == "distributed":
        centroids = train_ivf_centroids_distributed(
            embeddings, vec_col, n_centroids, kmeans_iters, seed, sample_size,
            id_col=id_col,
        )
    else:
        # lowest-id sample — deterministic under any partitioning
        sample = base.orderBy(F.col(id_col).asc()).limit(sample_size).toPandas()
        X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        rng = np.random.default_rng(seed)
        centroids = _kmeanspp_init(X, n_centroids, rng)
        for _ in range(kmeans_iters):
            assign = np.argmax(X @ centroids.T, axis=1)
            for c in range(len(centroids)):
                members = X[assign == c]
                if len(members):
                    m = members.sum(axis=0)
                    centroids[c] = m / np.linalg.norm(m)
    bc = spark.sparkContext.broadcast(centroids)

    def corpus_assign(batches):
        C = bc.value
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "list_id": np.argmax(Vn @ C.T, axis=1).astype(np.int32),
                    "v": pdf[vec_col],
                }
            )

    def query_probe(batches):
        C = bc.value
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            order = np.argsort(-(Vn @ C.T), axis=1)[:, :n_probe]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy().repeat(n_probe),
                    "list_id": order.reshape(-1).astype(np.int32),
                    "v": pdf[vec_col].to_numpy().repeat(n_probe),
                }
            )

    # Per-LIST block scoring (r14). The old path joined the (id, list_id)
    # sides into an explicit candidate-pair table — |Q|·n_probe·|list|
    # rows that then dragged BOTH raw vectors through an Arrow rescore
    # (≈ 520 B × pairs across the Python boundary) and a pair-sized
    # distinct. Here each inverted list is scored as ONE numpy block
    # (the LSH bucket shape, guide §8: payload moves once per list
    # membership, the n²/lists dot products never leave the kernel),
    # emitting only a per-query in-list shortlist of ids.
    #
    # Exactness: the kernel keeps every candidate whose RAW blocked
    # cosine is within 2e-6 of the query's in-list k-th best. The final
    # scores come from the UNCHANGED _rescore_topk path (per-pair
    # einsum + JVM half-up round + window), so kept pairs score
    # bit-identically to the old path; and any dropped candidate w has
    # raw_w < rawK − 2e-6, while final rounding moves a score by at
    # most 5e-7 (+ ~1 ULP matmul-vs-einsum noise, ≪ the slack), so the
    # ≥ k candidates at raw ≥ rawK still outrank w strictly AFTER
    # rounding — w was never in the global rounded top-k. The shortlist
    # is therefore a provable superset of the final top-k.
    corpus = base.mapInPandas(corpus_assign, "id long, list_id int, v array<float>")
    queries = base.mapInPandas(query_probe, "id long, list_id int, v array<float>")
    kk = int(k)
    CHUNK = 2048

    def list_shortlist(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"vec_id": [], "neighbor_id": []}).astype(
                {"vec_id": np.int64, "neighbor_id": np.int64}
            )
        c_ids = cpdf["id"].to_numpy(dtype=np.int64)
        C = np.stack(cpdf["v"].to_numpy()).astype(np.float64)
        cn = np.sqrt(np.einsum("ij,ij->i", C, C))
        out_q, out_n = [], []
        for q0 in range(0, len(qpdf), CHUNK):
            qc = qpdf.iloc[q0 : q0 + CHUNK]
            q_ids = qc["id"].to_numpy(dtype=np.int64)
            Q = np.stack(qc["v"].to_numpy()).astype(np.float64)
            qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
            S = (Q @ C.T) / (qn[:, None] * cn[None, :])
            S[q_ids[:, None] == c_ids[None, :]] = -np.inf  # self-pairs
            if S.shape[1] > kk:
                kth = np.partition(S, -kk, axis=1)[:, -kk]
            else:
                kth = np.full(len(Q), -np.inf)
            # isfinite kills the masked self-pairs even when kth is -inf
            # (a probed list with <= k members): `-inf >= -inf - 2e-6` is
            # True, so without this a query emits itself as a candidate
            # and _rescore_topk (which no longer carries the old
            # vec_id != neighbor_id filter) would rank (v, v, 1.0) first.
            mask = (S >= (kth[:, None] - 2e-6)) & np.isfinite(S)
            qi, ci = np.nonzero(mask)
            out_q.append(q_ids[qi])
            out_n.append(c_ids[ci])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
            }
        )

    shortlist = (
        queries.groupBy("list_id")
        .cogroup(corpus.groupBy("list_id"))
        .applyInPandas(list_shortlist, "vec_id long, neighbor_id long")
    )
    return _rescore_topk(base, shortlist, k, id_col, vec_col)


def _rescore_topk(base: DataFrame, cand_pairs: DataFrame, k: int, id_col: str, vec_col: str) -> DataFrame:
    """Attach vectors to candidate id-pairs and take exact-cosine top-k.

    Shared tail of every ANN path: the pair list is narrow (two longs), the
    payload joins happen exactly once per side, re-scoring is one Arrow
    batch einsum (cosine_batch).
    """
    va = base.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("qv"))
    vb = base.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        cand_pairs.join(va, "vec_id")
        .join(vb, "neighbor_id")
        .select(
            "vec_id",
            "neighbor_id",
            F.round(cosine_batch(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    chunk: int = 2048,
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-table hyperplane LSH.

    Each vector hashes into ``n_tables`` buckets (one per independent plane
    set); candidates = same (table, bucket); exact cosine re-scores
    candidates. Same output schema as ``brute_force_topk``.

    Defaults (4 planes × 8 tables) are calibrated for near-uniform random
    embeddings (recall ≈ 0.7 on the sf0.001 fixture — LSH's worst case;
    clustered real-world embeddings do far better). More planes → smaller
    buckets → cheaper but lower recall.

    Plan shape: vectors shuffle ONCE per table to their (table, bucket)
    group (the standard multi-index LSH storage cost); each group scores
    its own pairwise cosine matrix and emits only its local top-k per
    vector (provably a superset of the global candidate top-k, since a
    neighbor's in-bucket rank never exceeds its all-candidate rank); a
    narrow (vec_id, neighbor_id, sim) merge + window takes the final
    top-k. Nothing quadratic ever shuffles — the n²/2^planes pairwise
    work stays inside numpy per bucket, and the kernel scores fixed-size
    chunks so a pathological hot bucket (skewed hash) costs time, never
    task memory. Residual skew knobs: raise ``n_planes`` to shrink
    buckets; at extreme scale, split oversized buckets across tasks by
    salting both sides (the 2-D block shape ``brute_force_topk`` uses).
    """
    spark = embeddings.sparkSession
    from ..dist import ensure_shipped

    ensure_shipped(spark)
    base = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    bits_weight = (1 << np.arange(n_planes)).astype(np.int64)

    def bucketize(batches):
        # Hyperplanes are a pure function of (seed, dim): every worker
        # derives the identical (T*P, dim) matrix from its first batch —
        # no driver-side schema probe, no broadcast.
        P = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if P is None:
                dim = len(pdf["v"].iloc[0])
                P = np.concatenate(
                    [hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)]
                )
            Vm = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            signs = (Vm @ P.T) > 0  # (n, T*P)
            n = len(pdf)
            buckets = signs.reshape(n, n_tables, n_planes) @ bits_weight  # (n, T)
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy().repeat(n_tables),
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                    "v": pdf["v"].to_numpy().repeat(n_tables),
                }
            )

    bucketed = base.mapInPandas(
        bucketize, "vid long, table int, bucket long, v array<float>"
    )

    # Hot-bucket memory bound: a skewed hash can put a large fraction of
    # the corpus in one (table, bucket) group, and an m×m similarity
    # matrix OOMs the task long before compute hurts. The kernel scores
    # chunk×chunk blocks instead (32 MB per float64 block at the 2048
    # default), keeping each block's per-row top-k under the same
    # (sim desc, id asc) total order — a candidate in the global top-k
    # is in its block's top-k, so the chunked merge is bit-identical to
    # the full-matrix result (equivalence pinned in tests with a tiny
    # chunk).
    CHUNK = int(chunk)

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "cos_sim": []}).astype(
                {"vec_id": np.int64, "neighbor_id": np.int64, "cos_sim": np.float64}
            )
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        kk = min(k, m - 1)
        out_vec, out_nbr, out_sim = [], [], []
        for q0 in range(0, m, CHUNK):
            Q, q_ids = Vn[q0 : q0 + CHUNK], ids[q0 : q0 + CHUNK]
            nq = len(Q)
            part_sims, part_ids = [], []
            for c0 in range(0, m, CHUNK):
                C, c_ids = Vn[c0 : c0 + CHUNK], ids[c0 : c0 + CHUNK]
                S = np.round(Q @ C.T, 6)
                S[q_ids[:, None] == c_ids[None, :]] = -np.inf  # self-mask
                t = min(kk, S.shape[1])
                order = np.lexsort((np.broadcast_to(c_ids, S.shape), -S))[:, :t]
                part_sims.append(np.take_along_axis(S, order, axis=1))
                part_ids.append(c_ids[order])
            all_sims = np.hstack(part_sims)
            all_ids = np.hstack(part_ids)
            order = np.lexsort((all_ids, -all_sims))[:, :kk]
            top_sims = np.take_along_axis(all_sims, order, axis=1)
            top_ids = np.take_along_axis(all_ids, order, axis=1)
            out_vec.append(np.repeat(q_ids, kk))
            out_nbr.append(top_ids.reshape(-1))
            out_sim.append(top_sims.reshape(-1))
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_vec),
                "neighbor_id": np.concatenate(out_nbr),
                "cos_sim": np.concatenate(out_sim),
            }
        )

    local = bucketed.groupBy("table", "bucket").applyInPandas(
        bucket_topk, "vec_id long, neighbor_id long, cos_sim double"
    )
    # A pair found in several tables repeats with the same score — collapse,
    # then rank. The merge input is ≤ n·tables·k narrow rows, not n²/buckets.
    merged = local.groupBy("vec_id", "neighbor_id").agg(F.max("cos_sim").alias("cos_sim"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return merged.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def semdedup_assign(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The assignment stage of ``semdedup``, UNPINNED: per vector, the
    argmax-cosine centroid via a k-row broadcast crossJoin + per-id
    window (partitioned on the vector id — no global sort; the only
    single-partition exchange is the k-row lowest-id seed).
    Returns (id, v, cluster). ``semdedup`` pins this frame once for its
    three consumers; kept separate so the assignment plan contract
    stays visible to plan-shape tests.
    """
    from ..functions import vector as vec

    emb = embeddings.select(
        F.col(id_col).alias("id"), vec.to_double(F.col(vec_col)).alias("v")
    )
    if centroids is None:
        cents = (
            emb.orderBy("id")
            .limit(n_clusters)
            .select(F.col("id").alias("cid"), F.col("v").alias("cvec"))
        )
    else:
        cents = centroids
    sims = emb.crossJoin(F.broadcast(cents)).withColumn(
        "s", F.round(vec.cosine(F.col("v"), F.col("cvec")), 6)
    )
    w = Window.partitionBy("id").orderBy(F.col("s").desc(), F.col("cid").asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "v", F.col("cid").alias("cluster"))
    )


def semdedup(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    threshold: float = 0.97,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering the embedding space and dropping
    near-identical items *within* each cluster — the trick that makes
    corpus-level semantic dedup tractable: pairwise cosine is computed
    only inside a cluster, never across the corpus, so total compare
    cost is sum(|c_i|^2) instead of n^2.

    Plan shape (the 100 TB design):
    - centroids are k rows, broadcast; assignment is one narrow pass over
      the corpus (cross join with a k-row broadcast + per-id window — the
      window partitions on the vector id, so no global sort);
    - the in-cluster pair scan shuffles both sides on the cluster key
      (sum-of-squares cost is the SemDeDup contract; at real scale k is
      chosen so clusters stay small);
    - dedup rule: drop x if some same-cluster y with id < x has
      round(cosine(x, y), 6) >= threshold. Greedy-by-id, one self-join,
      no iteration — survivors within a cluster are pairwise below the
      threshold (the paper keeps one exemplar per dup set; keeping the
      lowest id is the deterministic, oracle-expressible choice).

    ``centroids`` (columns ``cid``, ``cvec: array<double>``) plugs in
    trained centers — ``train_ivf_centroids_distributed`` is the
    production path. The default (None) takes the k lowest-id vectors as
    seed centroids: fully deterministic, so the whole operator is
    bit-reproducible in ANSI SQL for the correctness oracle (a trained
    k-means assignment depends on float partial-sum order and is checked
    by recall/property tests instead, like IVF).

    Returns the surviving rows as (id_col, cluster).
    """
    from ..functions import vector as vec

    # pinned: three consumers (both in-cluster pair-scan sides + the
    # final anti-join base) — unpinned, the k-row crossJoin + per-id
    # argmax window over the whole corpus replayed three times (r14
    # plan audit: 6 embedding-table scans in this plan). Pinned rows =
    # the corpus vectors + cluster id, read back from block storage
    # instead of recomputing k cosines per vector per consumer.
    # (semdedup_assign stays a separate function so the assignment
    # subtree's plan contract — k-row broadcast, windowed argmax, no
    # global sort — remains visible to the plan-shape tests the pin
    # would otherwise hide behind a Scan ExistingRDD.)
    asg = semdedup_assign(
        embeddings, vec_col, id_col, n_clusters, centroids
    ).localCheckpoint(eager=False)
    # In-cluster scan as ONE numpy block per cluster (r14). The old
    # shape self-joined the assignment on the cluster key — Σ|c|² pair
    # ROWS each carrying both 64-double vectors, with the cosine folded
    # per pair by interpreted higher-order array expressions, then a
    # pair-sized distinct. Here each cluster's vectors shuffle ONCE to
    # their group and the kernel emits just the dropped ids: the Σ|c|²
    # dot products stay inside a blocked matmul (guide §8 — decide on
    # the payload where it sits, move it once). MEMORY CONTRACT (r15,
    # ADVICE r14): chunking bounds only the SCORE matrix (m×CHUNK
    # float64); the groupBy(cluster).applyInPandas task still holds the
    # whole cluster's VECTORS (~|c|·dim·8 B — with dim=64 a 2M-vector
    # cluster is ~1 GB of task memory). n_clusters must therefore scale
    # with corpus size so clusters stay task-sized — the same knob the
    # SemDeDup paper turns for compare cost (Σ|c|² ∝ n²/k). Scores
    # round with np.round exactly like the exact-verifier sibling
    # (cosine_dup_pairs / _block_sims, oracle-green vs DuckDB's round
    # on this family; np.round is half-even where the pre-r14 F.round
    # was half-up — the rules differ only on EXACT decimal .5 ties,
    # which a float64 cosine quotient cannot represent except by
    # construction; near-boundary parity pinned in test_r15_ops.py);
    # ids partition by cluster, so per-cluster dropped sets are
    # globally unique — no distinct.
    CHUNK = 2048

    def cluster_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id": []}).astype({"id": np.int64})
        ids = pdf["id"].to_numpy(dtype=np.int64)
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        vn = np.sqrt(np.einsum("ij,ij->i", V, V))
        dropped = np.zeros(m, dtype=bool)
        for c0 in range(0, m, CHUNK):
            Cv, c_ids = V[c0 : c0 + CHUNK], ids[c0 : c0 + CHUNK]
            S = np.round((V @ Cv.T) / (vn[:, None] * vn[c0 : c0 + CHUNK][None, :]), 6)
            hit = (S >= threshold) & (ids[:, None] < c_ids[None, :])
            dropped[c0 : c0 + CHUNK] |= hit.any(axis=0)
        return pd.DataFrame({"id": ids[dropped]})

    dropped = (
        asg.select("cluster", "id", "v")
        .groupBy("cluster")
        .applyInPandas(cluster_dropped, "id long")
    )
    return asg.join(dropped, "id", "left_anti").select(
        F.col("id").alias(id_col), "cluster"
    )


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_centroids: int = 16,
    iters: int = 8,
    sample_size: int = 4096,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., TPAMI 2011): split
    the (L2-normalized) vector into ``m`` contiguous subspaces and run
    plain Lloyd k-means per subspace on a driver sample. Returns
    (m, n_centroids, dim/m) float64 — tiny (m·k·dsub floats) at any
    corpus scale, broadcast to the encoders.

    The sample is the ``sample_size`` LOWEST ids — an unordered
    limit() would hand back whichever partitions answered first, making
    the codebooks (and every downstream code/ANN result) run- and
    partitioning-dependent. A keyed hash-order sample
    (orderBy(xxhash64(id))) would be equally deterministic and less
    clustered if ids correlate with content; id order keeps the oracle
    fixture stable."""
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(sample_size)
        .select(vec_col)
        .toPandas()
    )
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_centroids, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cent = S[rng.choice(len(S), size=n_centroids, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_centroids):
                members = S[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each (normalized) vector as ``m`` centroid ids — the
    compressed corpus representation (m bytes/vector vs 4·dim: 32x at
    dim=64, m=8). Narrow Arrow kernel, codebooks ride a broadcast."""
    spark = embeddings.sparkSession
    from ..dist import ensure_shipped

    ensure_shipped(spark)
    bc = spark.sparkContext.broadcast(codebooks)

    def kernel(batches):
        B = bc.value
        m, _, dsub = B.shape
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "codes": list(codes)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, "id long, codes array<int>"
    )


def adc_scan(
    queries: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    shortlist_k: int,
    n_shards: int | None = None,
) -> DataFrame:
    """The PQ asymmetric-distance scan, shared by the in-memory path
    (``pq_topk``) and the persisted-index serve path
    (``ann_index.pq_probe``): queries carry raw vectors (``id``, ``v``),
    the corpus is its m-byte codes (``id``, ``codes``), and the
    codebooks ride a broadcast. Same 2-D block grid as
    ``brute_force_topk`` — no driver collect, per-executor memory
    ~2·n/s rows of which the corpus side is m ints/row.

    Emits the per-query ``shortlist_k`` best (vec_id, neighbor_id,
    approx_sim) rows per block (exact-tie deterministic: lexsort on
    (-sim, id)); callers window a global top-k over the per-block
    shortlists. Rows where query id == corpus id are excluded
    (self-match). Bit-identical results regardless of which path built
    the codes — pinned by tests/test_ann_index.py.
    """
    spark = queries.sparkSession
    from ..dist import ensure_shipped

    ensure_shipped(spark)
    bc = spark.sparkContext.broadcast(books)
    if n_shards is None:
        par = spark.sparkContext.defaultParallelism
        n_shards = max(2, math.isqrt(max(par - 1, 0)) + 1)
    own_q = F.pmod(F.xxhash64(F.col("id")), F.lit(n_shards)).cast("int")
    all_shards = F.explode(F.array(*[F.lit(i) for i in range(n_shards)]))
    q = queries.withColumn("qs", own_q).withColumn("cs", all_shards)
    corpus = codes.withColumn(
        "cs", F.pmod(F.xxhash64(F.col("id")), F.lit(n_shards)).cast("int")
    ).withColumn("qs", all_shards)

    def block_topk(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": [], "neighbor_id": [], "approx_sim": []}).astype(
            {"vec_id": np.int64, "neighbor_id": np.int64, "approx_sim": np.float64}
        )
        if len(qpdf) == 0 or len(cpdf) == 0:
            return empty
        B = bc.value
        mm, _, dsub = B.shape
        q_ids = qpdf["id"].to_numpy(dtype=np.int64)
        c_ids = cpdf["id"].to_numpy(dtype=np.int64)
        Q = np.stack(qpdf["v"].to_numpy()).astype(np.float64)
        Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        C = np.stack(cpdf["codes"].to_numpy()).astype(np.int64)
        # ADC tables: lut[q, j, c] = <q_subj, codebook[j][c]>
        lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), mm, dsub), B)
        sims = np.zeros((len(Q), len(C)))
        for j in range(mm):
            sims += lut[:, j, C[:, j]]
        sims = np.round(sims, 6)
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf
        kk = min(shortlist_k, sims.shape[1])
        out_vec, out_nbr, out_sim = [], [], []
        for i in range(len(q_ids)):
            order = np.lexsort((c_ids, -sims[i]))[:kk]
            vals = sims[i][order]
            keep = vals > -np.inf
            out_vec.extend([q_ids[i]] * int(keep.sum()))
            out_nbr.extend(c_ids[order][keep])
            out_sim.extend(vals[keep])
        return pd.DataFrame(
            {
                "vec_id": np.asarray(out_vec, dtype=np.int64),
                "neighbor_id": np.asarray(out_nbr, dtype=np.int64),
                "approx_sim": np.asarray(out_sim, dtype=np.float64),
            }
        )

    return q.groupBy("qs", "cs").cogroup(corpus.groupBy("qs", "cs")).applyInPandas(
        block_topk, "vec_id long, neighbor_id long, approx_sim double"
    )


def pq_topk(
    embeddings: DataFrame,
    k: int = 5,
    m: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int | None = None,
    train_kwargs: dict | None = None,
    rerank: int = 10,
) -> DataFrame:
    """Approximate top-k cosine neighbors by asymmetric-distance product
    quantization (ADC): the corpus lives as m-byte codes, each query
    builds an (m × n_centroids) dot-product lookup table against the
    codebooks, and scoring a candidate is m table lookups + adds — a
    full scan of the COMPRESSED corpus (the memory-bound regime PQ
    exists for: 32x smaller residency than raw float32 at dim=64/m=8).

    Same 2-D block-sharding as ``brute_force_topk`` (queries carry raw
    vectors, corpus carries codes — no driver collect, per-executor
    memory ~2·n/s rows of which the corpus side is m ints/row); at 100
    TB compose with IVF lists (IVF-PQ) so each query scans n_probe
    lists of codes instead of everything.

    Output schema: with ``rerank=0`` the ADC scores surface as
    ``approx_sim``; the default rerank path rescores the shortlist with
    exact cosine over raw vectors, so its output matches
    brute_force_topk (``cos_sim``). Approximation error is the
    subspace-reconstruction error; recall/distortion are pytest-pinned
    on the clustered fixture.
    """
    spark = embeddings.sparkSession
    from ..dist import ensure_shipped

    ensure_shipped(spark)
    books = pq_train_codebooks(
        embeddings, m=m, n_centroids=n_centroids, vec_col=vec_col,
        id_col=id_col, **(train_kwargs or {}),
    )
    codes = pq_encode(embeddings, books, id_col, vec_col)
    qbase = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    local = adc_scan(qbase, codes, books, k * max(1, rerank), n_shards=n_shards)
    w = Window.partitionBy("vec_id").orderBy(F.col("approx_sim").desc(), F.col("neighbor_id"))
    if not rerank:
        return local.withColumn("rank", F.row_number().over(w).cast("long")).filter(
            F.col("rank") <= k
        )
    # Refine step (the production IVF-PQ pipeline): ADC over the codes
    # produces a k·rerank shortlist per query; exact cosine over RAW
    # vectors re-ranks only those candidates. The compressed scan bounds
    # memory, the rescore restores the fine ranks ADC can't resolve when
    # intra-cluster similarity gaps are below quantization error.
    shortlist = (
        local.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= k * rerank)
        .select("vec_id", "neighbor_id")
    )
    return _rescore_topk(
        embeddings.select(F.col(id_col).alias("vec_id_src"), F.col(vec_col).alias("v"))
        .select(F.col("vec_id_src").alias(id_col), F.col("v").alias(vec_col)),
        shortlist, k, id_col, vec_col
    )


def pca_fit(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 2,
):
    """Distributed PCA fit: one corpus pass computes per-partition
    (count, Σv, Σvvᵀ) partials executor-side (mapInPandas, Arrow
    batches, numpy BLAS for the d×d Gram), partials reduce through a
    posexplode + groupBy(idx) whose shuffle carries 1+d+d² rows PER
    PARTITION (for d=64 that is 4,161 doubles — independent of corpus
    size), and the driver assembles the d×d covariance and runs eigh on
    it. Driver memory is O(d²) at any corpus size — the standard
    tall-skinny decomposition split.

    Returns (components, explained_variance, mean): numpy arrays with a
    deterministic sign convention (each component's largest-|coefficient|
    entry is positive). Partial Gram sums are float (cross-partition
    reduce order can drift ULPs), so PCA results are tolerance-checked
    in pytest, never hash-oracled (registry rules: no oracle entry).
    """
    spark = embeddings.sparkSession
    from ..dist import ensure_shipped

    ensure_shipped(spark)

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            flat = np.concatenate(
                ([float(len(X))], X.sum(axis=0), (X.T @ X).ravel())
            )
            yield pd.DataFrame({"vals": [flat.tolist()]})

    agg = (
        embeddings.select(vec_col)
        .mapInPandas(partials, "vals array<double>")
        .select(F.posexplode("vals").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    flat = np.zeros(max(r.idx for r in agg) + 1)
    for r in agg:
        flat[r.idx] = r.s
    n = int(round(flat[0]))
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    d = int(round(math.sqrt(len(flat) - 1 + 0.25) - 0.5))  # 1 + d + d^2 = len
    mean = flat[1 : 1 + d] / n
    gram = flat[1 + d :].reshape(d, d)
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    components = evecs[:, order].T
    # deterministic sign: largest-|coeff| entry positive per component
    for c in components:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1.0
    return components, evals[order], mean


def pca_project(
    embeddings: DataFrame,
    components,
    mean,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Project vectors onto fitted components — JVM-side, no Python in
    the hot path: each projection is zip_with(vec, literal component,
    multiply) folded by F.aggregate, minus the precomputed μ·c offset.
    A narrow codegen'd map over the corpus; the fit's literals ride the
    closure, so the projection scales as a plain scan.
    """
    out = [F.col(id_col)]
    for j, c in enumerate(components):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        offset = float(np.dot(mean, c))
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out.append(F.round(dot - F.lit(offset), decimals).alias(f"pc{j + 1}"))
    return embeddings.select(*out)


def hard_negative_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    n_shards: int | None = None,
) -> DataFrame:
    """Filtered vector search — top-k most-similar vectors from a
    DIFFERENT group: hard-negative mining for contrastive training
    (per query, the closest examples that are *not* its class are the
    informative negatives), and the general shape of predicate-filtered
    ANN (the filter applies per-(query, candidate) pair, so it cannot be
    a static corpus pre-filter).

    Same 2-D block-sharded exact plan as brute_force_topk — the group
    label rides along into each block, the same-group mask applies
    INSIDE the block before the local top-k (the local-topk-superset
    argument holds per filtered candidate set), and a narrow window
    merge takes the global top-k. NULL groups compare equal to each
    other (a NULL-group query excludes NULL-group candidates), matching
    SQL's IS DISTINCT FROM.
    """
    if n_shards is None:
        par = embeddings.sparkSession.sparkContext.defaultParallelism
        n_shards = max(2, math.isqrt(max(par - 1, 0)) + 1)
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(group_col).alias("g")
    )
    own = F.pmod(F.xxhash64(F.col("id")), F.lit(n_shards)).cast("int")
    all_shards = F.explode(F.array(*[F.lit(i) for i in range(n_shards)]))
    queries = base.withColumn("qs", own).withColumn("cs", all_shards)
    corpus = base.withColumn("cs", own).withColumn("qs", all_shards)

    def block_topk(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "cos_sim": []}).astype(
                {"vec_id": np.int64, "neighbor_id": np.int64, "cos_sim": np.float64}
            )
        q_ids, c_ids, sims = _block_sims(qpdf, cpdf)
        q_g = qpdf["g"].to_numpy(dtype=object)
        c_g = cpdf["g"].to_numpy(dtype=object)
        sims[q_g[:, None] == c_g[None, :]] = -np.inf  # same group (or both NULL)
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf  # self (belt-and-braces)
        kk = min(k, sims.shape[1])
        out_vec, out_nbr, out_sim = [], [], []
        for i in range(len(q_ids)):
            order = np.lexsort((c_ids, -sims[i]))[:kk]
            vals = sims[i][order]
            keep = vals > -np.inf
            out_vec.extend([q_ids[i]] * int(keep.sum()))
            out_nbr.extend(c_ids[order][keep])
            out_sim.extend(vals[keep])
        return pd.DataFrame(
            {
                "vec_id": np.asarray(out_vec, dtype=np.int64),
                "neighbor_id": np.asarray(out_nbr, dtype=np.int64),
                "cos_sim": np.asarray(out_sim, dtype=np.float64),
            }
        )

    local = queries.groupBy("qs", "cs").cogroup(corpus.groupBy("qs", "cs")).applyInPandas(
        block_topk, "vec_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def fuzzy_string_pairs(
    df: DataFrame,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Edit-distance fuzzy self-join over a string column's DISTINCT
    values: all pairs with ``levenshtein <= max_dist`` — approximate
    string matching, the ER mechanism Fellegi–Sunter's exact-equality
    fields can't express (typos, OCR noise, transliteration drift).

    LOSSLESS candidate generation (the brute-force oracle proves it,
    the close_pairs doctrine): one edit disturbs at most ``q`` distinct
    q-grams, so strings within ``max_dist`` edits share at least
    ``max(|G(a)|, |G(b)|) − max_dist·q`` distinct q-grams — the classic
    q-gram count filter. Candidates come from ONE hash equi-join on the
    exploded distinct q-grams plus the necessary length-band
    ``|len(a) − len(b)| <= max_dist``; exact ``levenshtein`` refines.
    Strings shorter than ``q·(max_dist + 1)`` can defeat the bound
    (two 2-char strings at distance 2 share zero bigrams), so they
    take a separate length-banded all-pairs branch against the full
    vocabulary — bounded by the short-string vocabulary, which is tiny
    by pigeonhole (few distinct strings exist under that length).

    Scale: everything runs on the DISTINCT value table (vocabulary-
    sized, not row-sized); the gram join's candidate count is
    Σ per-gram occupancy² — the grid-file contract; hot grams (a gram
    shared by half the vocabulary) respond to bigger ``q`` exactly as
    bands respond to more bits. Output: (name_a, name_b, dist),
    name_a < name_b.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if q < 2:
        raise ValueError("q must be >= 2")
    names = (
        df.select(F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull() & (F.length("s") > 0))
        .distinct()
        .withColumn("len", F.length("s"))
    )
    short_max = q * (max_dist + 1)
    lng = names.filter(F.col("len") >= short_max)
    sht = names.filter(F.col("len") < short_max)
    gset = F.array_distinct(
        F.expr(f"transform(sequence(1, length(s) - {q} + 1), i -> substring(s, i, {q}))")
    )
    gl = lng.select(
        "s", "len", F.size(gset).alias("gn"), F.explode(gset).alias("g")
    )
    a = gl.select(
        F.col("s").alias("sa"), F.col("len").alias("la"), F.col("gn").alias("gna"), "g"
    )
    b = gl.select(
        F.col("s").alias("sb"), F.col("len").alias("lb"), F.col("gn").alias("gnb"), "g"
    )
    shared = (
        a.join(b, "g")
        .filter(
            (F.col("sa") < F.col("sb"))
            & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
        )
        .groupBy("sa", "sb", "gna", "gnb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(
            F.col("shared")
            >= F.greatest(
                F.lit(1), F.greatest("gna", "gnb") - F.lit(max_dist * q)
            )
        )
    )
    long_pairs = shared.select("sa", "sb")
    # short strings: length-banded all-pairs vs the FULL vocabulary
    # (the qgram bound can reach zero below short_max)
    short_pairs = (
        sht.select(F.col("s").alias("ss"), F.col("len").alias("ls"))
        .join(
            names.select(F.col("s").alias("so"), F.col("len").alias("lo")),
            F.abs(F.col("ls") - F.col("lo")) <= max_dist,
        )
        .filter(F.col("ss") != F.col("so"))
        .select(
            F.least("ss", "so").alias("sa"), F.greatest("ss", "so").alias("sb")
        )
        .distinct()
    )
    cand = long_pairs.unionByName(short_pairs)
    dist = F.levenshtein(F.col("sa"), F.col("sb"))
    return (
        cand.withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select(F.col("sa").alias("name_a"), F.col("sb").alias("name_b"), "dist")
    )


def rouge_n_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "id_a",
    b_col: str = "id_b",
    n: int = 2,
) -> DataFrame:
    """ROUGE-n overlap scoring of candidate document pairs — the
    LLM-eval-style CLIPPED n-gram precision/recall/F1 (Lin 2004) the
    dedup family's set-Jaccard can't give: Jaccard ignores repetition
    and direction; ROUGE counts each n-gram up to min(count_a,
    count_b) and reads doc_b as the reference, so it distinguishes "a
    contains b" from "b contains a" (containment pruning, quote
    detection, summary-vs-source audits).

    Exactness: all gram counts are BIGINTs; P = overlap/total_a,
    R = overlap/total_b, F1 = 2·overlap/(total_a+total_b) — note F1
    reduces to that single exact-integer division, which is the form
    both engines compute identically (no P·R/(P+R) float chain).

    Scale shape: the corpus-sized pass is ONE (doc, gram) groupBy
    (pinned — it feeds both pair sides and the totals); scoring work
    is candidate-bounded (the pair generator's contract, e.g. the
    LSH-banded near-dup pairs), shuffled on the gram key per side. A
    pair sharing no gram scores 0/0/0 via the left join, not a
    dropped row. Output: (key_a, key_b, overlap, total_a, total_b,
    p, r, f1).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        grams = F.col("w")
    else:
        grams = F.expr(
            f"transform(sequence(1, size(w) - {n - 1}),"
            f" i -> concat_ws(' ', slice(w, i, {n})))"
        )
    gc = (
        docs.select(
            F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("w")
        )
        .filter(F.size("w") >= n)
        .select("id", F.explode(grams).alias("gs"))
        # hash the gram BEFORE the corpus groupBy (r15): the shuffle key
        # and the pinned rows carry 8 B instead of the n-word string
        # (the jaccard family's trade — 64-bit collisions are immaterial
        # at any corpus where this runs, and a within-doc collision
        # merges two count rows without changing totals). Overlap only
        # needs gram EQUALITY, never the text.
        .select("id", F.xxhash64("gs").alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # feeds both pair sides + totals
    )
    tot = gc.groupBy("id").agg(F.sum("c").cast("long").alias("t"))
    # pinned: the candidate list feeds the overlap join AND the output
    # spine — unpinned, the caller's pair generator (e.g. the full
    # MinHash-LSH chain) evaluated twice (r14 plan audit)
    p = pairs.select(F.col(a_col).alias("ka"), F.col(b_col).alias("kb")).localCheckpoint(
        eager=False
    )
    ov = (
        p.join(gc.select(F.col("id").alias("ka"), "g", F.col("c").alias("ca")), "ka")
        .join(
            gc.select(F.col("id").alias("kb"), F.col("g").alias("g"), F.col("c").alias("cb")),
            ["kb", "g"],
        )
        .groupBy("ka", "kb")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("overlap"))
    )
    out = (
        p.join(ov, ["ka", "kb"], "left")
        .join(tot.select(F.col("id").alias("ka"), F.col("t").alias("total_a")), "ka")
        .join(tot.select(F.col("id").alias("kb"), F.col("t").alias("total_b")), "kb")
        .withColumn("overlap", F.coalesce(F.col("overlap"), F.lit(0).cast("long")))
    )
    dv = lambda a, b: F.when(  # noqa: E731
        b > 0, a.cast("double") / b.cast("double")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("ka").alias("key_a"),
        F.col("kb").alias("key_b"),
        "overlap",
        "total_a",
        "total_b",
        F.round(dv(F.col("overlap"), F.col("total_a")), 6).alias("p"),
        F.round(dv(F.col("overlap"), F.col("total_b")), 6).alias("r"),
        F.round(
            dv(2 * F.col("overlap"), F.col("total_a") + F.col("total_b")), 6
        ).alias("f1"),
    )
