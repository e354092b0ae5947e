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
