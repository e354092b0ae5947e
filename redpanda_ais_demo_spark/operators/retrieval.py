"""Full-text retrieval over the documents corpus: BM25 (Okapi) scoring —
the standard lexical ranking function for corpus search, query-set
decontamination lookups, and hard-negative mining in training-data
pipelines.

Scale design (100 TB):
- the token explode is filtered to the query terms BEFORE any shuffle
  (broadcast isin on a literal array), so the only rows that ever move
  are postings of the queried terms — shuffle ∝ matching tokens, not
  corpus size.
- document length (dl) is a narrow per-row computation (no explode);
  corpus stats (N, avgdl) are two scalars from one aggregate — a single
  cheap job whose result parameterizes the scoring expression as
  literals (the same pattern as the CC convergence scalars).
- per-term document frequencies are a vocabulary-of-the-query-sized
  aggregate (≤ |terms| rows) joined back by broadcast.
- top-k is a global sort-limit → Spark plans TakeOrderedAndProject
  (per-partition heaps + driver merge of k rows), never a full sort.

Cross-engine determinism: per-(doc, term) contributions are quantized to
integer micro-units (round(x*1e6)) and SUMMED AS BIGINTs, so the
3-term sum is exact and associativity-free on both engines; the final
score divides once by 1e6 (plans/registry.py determinism rules).

The reference has no text-retrieval surface (SURVEY.md §2.11 — extension
per the BASELINE.json north star, same family as X5 text analysis).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under Okapi BM25 with
    the Lucene idf: ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Returns (doc_id, score, rank) — rank is dense over (score desc,
    doc_id asc), so results are total-ordered and oracle-comparable.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    base = docs.select(
        F.col(id_col).alias("id"), T.tokens(F.col(text_col)).alias("w")
    )
    # corpus stats: two scalars, one job; literalized into the plan below
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("w")).alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = stats.n_docs, stats.avgdl

    term_arr = F.array(*[F.lit(t) for t in terms])
    postings = (
        base.select("id", F.size("w").alias("dl"), F.explode("w").alias("t"))
        .filter(F.array_contains(term_arr, F.col("t")))
    )
    tf = postings.groupBy("id", "t").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    return bm25_score_topk(tf, dfreq, n_docs, avgdl, k, k1, b, id_col)


def bm25_score_topk(
    tf: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """Shared BM25 scoring tail: (id, t, tf, dl) postings + (t, df) doc
    frequencies + literalized corpus stats -> (id_col, score, rank)
    top-``k``. Both the direct path (``bm25_topk``) and the persisted-
    index probe (``text_index.bm25_probe``) end in this exact expression
    tree, which is what makes probe-vs-direct results bit-identical.
    """
    idf = dfreq.select(
        "t",
        F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "t")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
        # integer micro-units: the per-doc sum is exact → engine-order-free
        .withColumn("micro", F.round(F.col("contrib") * 1e6).cast("long"))
    )
    scores = contrib.groupBy("id").agg((F.sum("micro") / 1e6).alias("score"))
    # sort-limit FIRST (TakeOrderedAndProject: per-partition heaps, k rows
    # to the driver-side merge) — the ranking window then runs over ≤k rows,
    # never a SinglePartition pass over the corpus
    topk = scores.orderBy(F.col("score").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias(id_col), "score", "rank"
    )


def query_cosine_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` rows by cosine similarity against ONE literal query
    vector — the single-query retrieval primitive (vs the all-pairs
    ``similarity.brute_force_topk``).

    Scale design: the query vector rides the expression tree as literals,
    so this is a NARROW projection over one corpus scan — no join, no
    shuffle of the embedding table; top-k plans TakeOrderedAndProject
    (per-partition heaps, k rows to the driver merge). At 100 TB the ANN
    paths (``similarity.lsh_topk`` / ``ivf_topk``) answer first and this
    exact form is the verifier/re-ranker.

    Determinism: the dot product is a left-to-right ``aggregate`` fold
    over the same doubles DuckDB's ``list_dot_product`` folds, the query
    norm is the same sequential Python sum, and the cosine is rounded to
    6 dp before ordering (registry determinism rules).

    Returns (id_col, cos_sim, rank), rank dense over (cos desc, id asc).
    """
    if not query_vec:
        raise ValueError("query_vec must be non-empty")
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    if qnorm == 0.0:
        raise ValueError("query_vec has zero norm — cosine undefined")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, qlit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    # a query/embedding dimension mismatch would silently zip-pad with
    # nulls and emit NULL cos_sim for every row — fail the job instead,
    # at the first mismatching row (one size() compare per row)
    cos = F.when(
        F.size(F.col(vec_col)) == len(query_vec),
        F.round(dot / (nrm * F.lit(qnorm)), 6),
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"query_cosine_topk: query dim {len(query_vec)} != embedding dim %s",
                F.size(F.col(vec_col)),
            )
        )
    )
    scored = emb.select(F.col(id_col).alias("id"), cos.alias("cos_sim"))
    topk = scored.orderBy(F.col("cos_sim").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias(id_col), "cos_sim", "rank"
    )


def rrf_fuse(
    legs: Sequence[DataFrame],
    k0: int = 60,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    fuse N retrieval rankings by ``score(d) = Σ_legs 1/(k0 + rank_leg(d))``
    — the standard hybrid-search combiner (lexical BM25 + semantic ANN)
    because it needs no score calibration between legs, only ranks.

    Each leg must carry (id_col, rank). A document absent from a leg
    contributes 0 from that leg. Output: (id_col, rank_0..rank_{n-1}
    per-leg ranks — NULL where absent, kept for explainability —
    rrf_score, rank).

    Scale design: every leg is already a top-k (≤ tens of rows at any
    corpus size), so the fusion full-outer joins and final sort touch
    O(Σ leg sizes) rows — broadcastable, cost independent of corpus size.
    Determinism: per-leg contributions quantize to integer micro-units
    (round(1e6/(k0+rank))) and ADD as BIGINTs — associativity-free
    cross-engine; with k0=60 and leg depth ≤ 20 no contribution lands on
    a .5 rounding boundary (1e6/d is never half-integral for 61 ≤ d ≤ 80).
    """
    if not legs:
        raise ValueError("legs must be non-empty")
    fused = None
    for i, leg in enumerate(legs):
        sel = leg.select(
            F.col(id_col).alias("id"), F.col("rank").alias(f"rank_{i}")
        )
        fused = sel if fused is None else fused.join(sel, "id", "full_outer")
    micro = None
    for i in range(len(legs)):
        c = F.coalesce(
            F.round(F.lit(1e6) / (F.lit(float(k0)) + F.col(f"rank_{i}")), 0).cast("long"),
            F.lit(0).cast("long"),
        )
        micro = c if micro is None else micro + c
    scored = fused.withColumn("rrf_micro", micro)
    topk = scored.orderBy(F.col("rrf_micro").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .withColumn("rrf_score", (F.col("rrf_micro") / 1e6))
        .select(
            F.col("id").alias(id_col),
            *[f"rank_{i}" for i in range(len(legs))],
            "rrf_score",
            "rank",
        )
    )


def hard_negatives(
    lex_topk: DataFrame,
    sem_topk: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hard-negative mining for retrieval/contrastive training: documents
    the LEXICAL ranker surfaces (top-k BM25 — plausible surface matches)
    that the SEMANTIC ranking rejects (absent from the embedding top-k).
    These "close but wrong" candidates are the negatives that teach an
    embedding model the most (cf. DPR, Karpukhin et al. 2020); random
    negatives are too easy, semantic-positive ones are false negatives.

    Inputs are the two ranked legs (id, rank) — the same leg contract as
    ``rrf_fuse``. Output: (id_col, lex_rank), hardest (best-lexical-rank)
    first. Scale: an anti-join of two ≤k-row top-k results — broadcast,
    corpus-size-independent; at 100 TB the legs swap to their ANN forms.
    """
    lex = lex_topk.select(F.col(id_col).alias("id"), F.col("rank").alias("lex_rank"))
    sem = sem_topk.select(F.col(id_col).alias("id"))
    return (
        lex.join(sem, "id", "left_anti")
        .orderBy("lex_rank")
        .select(F.col("id").alias(id_col), "lex_rank")
    )


def phrase_proximity(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Proximity ranking: documents where ``term_a`` and ``term_b`` occur
    CLOSE TOGETHER rank first (min token-position distance over all
    occurrence pairs) — the classic relevance signal bag-of-words BM25
    cannot see ("hash join" as a phrase vs the two words pages apart).

    Scale design: positions come from indexed higher-order lambdas over
    the token array — a NARROW projection, no explode (a positional
    explode would shuffle every token); the pairwise min runs inside the
    row over the few occurrence positions. Top-k is sort-limit →
    TakeOrderedAndProject. Returns (id_col, min_dist, rank), nearest
    first, docs containing both terms only.
    """
    w = T.tokens(F.col(text_col))
    indexed = F.transform(w, lambda x, i: F.struct(x.alias("t"), i.alias("i")))

    def positions(term: str):
        return F.transform(
            F.filter(indexed, lambda s: s.t == term), lambda s: s.i
        )

    pa, pb = positions(term_a), positions(term_b)
    min_dist = F.array_min(
        F.transform(
            pa, lambda a: F.array_min(F.transform(pb, lambda b: F.abs(a - b)))
        )
    )
    scored = (
        docs.select(
            F.col(id_col).alias("id"),
            pa.alias("pa"),
            pb.alias("pb"),
            min_dist.alias("min_dist"),
        )
        .filter((F.size("pa") > 0) & (F.size("pb") > 0))
        .select("id", F.col("min_dist").cast("int").alias("min_dist"))
    )
    topk = scored.orderBy("min_dist", "id").limit(k)
    w_rank = Window.orderBy("min_dist", "id")
    return topk.withColumn("rank", F.row_number().over(w_rank)).select(
        F.col("id").alias(id_col), "min_dist", "rank"
    )


def ranking_metrics(
    truth: DataFrame,
    candidate: DataFrame,
    k: int,
    query_col: str = "vec_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Evaluate an approximate ranking against exact truth — the
    evaluation layer of the similarity family (build → serve →
    MEASURE): per query, recall@k (|cand∩truth| / min(k, |truth|)),
    NDCG@k with binary relevance (rel=1 iff the candidate item is in
    the truth top-k; ideal DCG = the first min(k,|truth|) positions),
    and rr_at_k (reciprocal rank of the FIRST relevant candidate —
    the navigational metric; 0.0 when no hit lands inside k).

    Exactness: hit counts are integers; DCG terms 1/log2(rank+1) are
    fixed doubles from integer ranks, quantized to micro-units and
    summed exactly, then ONE division per query — deterministic
    cross-engine and partition-independent.

    Plan: one inner join on (query, item) ranks the hits, two
    partial-aggregable groupBys — never a per-query collect. Queries
    with no truth rows are dropped (undefined metrics).
    """
    t = truth.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"), F.col(item_col).alias("item")
    )
    c = candidate.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("item"),
        F.col(rank_col).alias("crank"),
    )
    t_sizes = t.groupBy("q").agg(F.count("*").alias("n_truth"))
    hits = c.join(t, ["q", "item"])  # inner: candidate items that are relevant
    # DCG in micro-units: Σ_hits round(1e6 / log2(crank + 1))
    dcg_term = F.round(F.lit(1e6) / F.log2(F.col("crank") + 1)).cast("long")
    per_q = hits.groupBy("q").agg(
        F.count("*").alias("n_hits"),
        F.sum(dcg_term).alias("dcg_micro"),
        F.min("crank").alias("first_hit_rank"),
    )
    # ideal DCG for n relevant docs: Σ_{i=1..min(k,n)} round(1e6 / log2(i+1))
    ideal = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("n_truth"))),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.round(F.lit(1e6) / F.log2(i + 1)).cast("long"),
    )
    joined = t_sizes.join(per_q, "q", "left").select(
        F.col("q").alias(query_col),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0))
            / F.least(F.lit(k), F.col("n_truth")),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.col("dcg_micro"), F.lit(0)) / ideal, 6
        ).alias("ndcg_at_k"),
        # reciprocal rank of the FIRST relevant candidate (the navigational
        # metric next to recall's set view and NDCG's graded view);
        # no hit inside k -> 0.0 by the standard convention
        F.round(
            F.coalesce(
                F.lit(1.0) / F.col("first_hit_rank").cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("rr_at_k"),
    )
    return joined


def ndcg_discounts_nano(k: int) -> tuple[list[int], list[int]]:
    """Per-rank NDCG discount weights 1/log2(i+1) for i = 1..k, as
    nano-unit integers, plus their prefix sums (P[0] = 0). Computed
    once driver-side and embedded as LITERALS in both the Spark plan
    and the DuckDB oracle — the discount table never touches either
    engine's log(), so the metric is exact-integer end to end."""
    d = [round(1e9 / math.log2(i + 1)) for i in range(1, k + 1)]
    p = [0]
    for x in d:
        p.append(p[-1] + x)
    return d, p


def ndcg_at_k(
    ranked: DataFrame,
    counts: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    n2_col: str = "n2",
    n1_col: str = "n1",
    k: int = 10,
) -> DataFrame:
    """Graded NDCG@k per query — the rank-DISCOUNTED retrieval metric
    the eval family's AUC/AP can't give (those are order statistics
    over the whole ranking; NDCG pays most for what sits in the first
    screenful, which is what a retrieval UI actually shows).

    ``ranked``: one row per (query, rank 1..k) with graded relevance
    ``rel`` in {0, 1, 2} (gain 2^rel − 1 in {0, 1, 3}). ``counts``: one
    row per query with the IDEAL pool sizes — n2 = #grade-2 candidates,
    n1 = #grade-1 candidates in the whole corpus — from which the ideal
    DCG is CLOSED-FORM: the best ordering packs min(n2, k) twos then
    min(n1, k − t2) ones, so IDCG = 3·P[t2] + (P[t2+t1] − P[t2]) over
    the literal prefix-sum table. No per-query ideal re-ranking, no
    second sort — the counts are vocabulary-bounded group sizes.

    All gains and discounts are exact nano-unit integers; ndcg is ONE
    double division per query, rounded to 6dp. Queries with an empty
    ideal pool (idcg = 0) emit NULL ndcg.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    d, p = ndcg_discounts_nano(k)
    darr = F.array(*[F.lit(int(x)).cast("long") for x in d])
    parr = F.array(*[F.lit(int(x)).cast("long") for x in p])
    gain = (
        F.when(F.col(rel_col) == 2, 3)
        .when(F.col(rel_col) == 1, 1)
        .otherwise(0)
        .cast("long")
    )
    dcg = (
        ranked.filter(F.col(rank_col) <= k)
        .groupBy(F.col(query_col).alias("__q"))
        .agg(
            F.sum(gain * F.element_at(darr, F.col(rank_col).cast("int")))
            .cast("long")
            .alias("dcg_nano")
        )
    )
    t2 = F.least(F.col(n2_col), F.lit(k)).cast("int")
    t1 = F.least(F.col(n1_col), F.lit(k) - t2).cast("int")
    ideal = counts.select(
        F.col(query_col).alias("__q"),
        F.col(n2_col).cast("long").alias("n2"),
        F.col(n1_col).cast("long").alias("n1"),
        (
            F.lit(3).cast("long") * F.element_at(parr, t2 + 1)
            + F.element_at(parr, t2 + t1 + 1)
            - F.element_at(parr, t2 + 1)
        )
        .cast("long")
        .alias("idcg_nano"),
    )
    out = ideal.join(dcg, "__q", "left").select(
        F.col("__q").alias(query_col),
        "n2",
        "n1",
        F.coalesce(F.col("dcg_nano"), F.lit(0)).cast("long").alias("dcg_nano"),
        "idcg_nano",
        F.when(
            F.col("idcg_nano") > 0,
            F.round(
                F.coalesce(F.col("dcg_nano"), F.lit(0)).cast("double")
                / F.col("idcg_nano").cast("double"),
                6,
            ),
        ).alias("ndcg"),
    )
    return out
