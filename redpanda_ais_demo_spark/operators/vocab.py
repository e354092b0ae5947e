"""BPE tokenizer training (vocabulary induction) as an iterative Spark
job — the learn-the-tokenizer step that precedes every token-count,
packing and quality stage of a pretraining pipeline (Sennrich et al.
2016, the byte-pair-encoding merge procedure; public algorithm).

Scale shape: the corpus collapses ONCE into the distinct-word frequency
table (classic BPE trains on word counts, not raw text) — a single
corpus-sized shuffle, after which every merge round runs on the small
word-vocabulary table: per-round cost is one vocab-sized pair count +
one driver-side argmax scalar (bounded, like the connected-components
convergence probes) + a narrow higher-order-function rewrite of the
symbol arrays. No Python in any per-row path: pair extraction and merge
application are `transform`/`aggregate` lambdas inside codegen.

Determinism: ties on pair count break lexicographically, so the merge
sequence is a pure function of the corpus. Correctness is pinned
against a pure-Python reference BPE in tests/test_llm_ops.py (exact
merge-table equality) — engine-external, like an oracle, but not
SQL-expressible (the loop carries state), so the declared query is
rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_END = "</w>"


def _word_symbol_table(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct words with counts, each as its initial character-symbol
    array (plus the end-of-word marker symbol)."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    wc = words.groupBy("word").agg(F.count("*").alias("n"))
    syms = F.concat(
        F.transform(F.split(F.col("word"), ""), lambda c: c),
        F.array(F.lit(_END)),
    )
    return wc.select("word", "n", syms.alias("syms"))


def _pair_counts(table: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts, weighted by word frequency."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
        F.slice(F.col("syms"), 2, F.greatest(F.size("syms") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        table.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n").alias("pair_count"))
    )


def _apply_merge(table: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy leftmost merge of (left, right) → left||right in every
    word's symbol array — an `aggregate` fold, no Python."""
    a, b = F.lit(left), F.lit(right)
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(a, b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return table.select("word", "n", merged.alias("syms"))


def bpe_train(docs: DataFrame, n_merges: int = 10, text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus. Returns
    the merge table: (merge_rank, left, right, merged, pair_count) in
    learned order — the artifact a tokenizer ships.

    The per-round driver action is a single argmax row (count desc, then
    lexicographic (left, right) — fully deterministic); everything else
    stays distributed. ``localCheckpoint`` caps the lineage the iterative
    rewrite would otherwise stack up.
    """
    spark = docs.sparkSession
    table = _word_symbol_table(docs, text_col).localCheckpoint()
    out = []
    for rank in range(n_merges):
        best = (
            _pair_counts(table)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0].pair_count <= 0:
            break
        l, r, c = best[0].left, best[0].right, int(best[0].pair_count)
        out.append((rank, l, r, l + r, c))
        table = _apply_merge(table, l, r).localCheckpoint()
    return spark.createDataFrame(
        out, "merge_rank int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge table: apply the merges in rank
    order to every word, then count subwords per document — the encode
    side of ``bpe_train`` (train → ship merge table → encode corpus).

    Each merge is one ``aggregate`` fold over the symbol arrays, chained
    in rank order inside a single projection — all codegen, no shuffle,
    no Python; the corpus streams through once regardless of merge count.
    Returns (id row ..., n_words, n_subwords).
    """
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    syms_per_word = F.transform(
        words,
        lambda w: F.concat(F.transform(F.split(w, ""), lambda c: c), F.array(F.lit(_END))),
    )
    # closure factory, not default-arg binding: PySpark infers a HOF's
    # arity from the lambda's parameter count, so extra defaulted params
    # would read as a 3-argument transform lambda
    def _merge_lambda(left: str, right: str):
        a, b = F.lit(left), F.lit(right)

        def apply(syms):
            return F.aggregate(
                syms,
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(a, b))),
                ).otherwise(F.concat(acc, F.array(x))),
            )

        return apply

    col = syms_per_word
    for left, right in merges:
        col = F.transform(col, _merge_lambda(left, right))
    n_sub = F.aggregate(
        F.transform(col, lambda syms: F.size(syms)), F.lit(0), lambda acc, x: acc + x
    )
    return docs.select(
        "*",
        F.size(words).alias("n_words"),
        n_sub.cast("long").alias("n_subwords"),
    )
