"""Corpus-level training-data operators (BASELINE.json north star):
deterministic sampling, sequence packing, rarity-weighted term ranking.

Everything here is pure DataFrame composition over built-in functions —
codegen'd, shuffle-minimal, no Python in the hot path — because each of
these runs over the full corpus in a real pretraining pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def stratified_sample(
    df: DataFrame, strata_cols: list[str], n_per_stratum: int, order_col: str
) -> DataFrame:
    """First ``n_per_stratum`` rows per stratum in ``order_col`` order —
    the deterministic form of per-class downsampling (data mixing /
    class balancing). One shuffle on the strata key; rank is windowed,
    so partial aggregation doesn't apply, but each stratum's rows stream
    through a single sort — at scale make ``order_col`` a pre-computed
    priority (quality score, hash) rather than arrival order.
    """
    w = Window.partitionBy(*strata_cols).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float, buckets: int = 1_000_000) -> DataFrame:
    """Deterministic fractional sample: keep rows whose key hashes into
    the first ``fraction`` of ``buckets``. Unlike ``df.sample()`` this is
    stable across runs/partitionings and CONSISTENT ACROSS TABLES — any
    table sampled on the same key keeps the same entities, so sampled
    fact/dim joins still line up. Engine-internal hash (xxhash64): no
    SQL oracle; invariants are unit-tested.
    """
    cutoff = int(fraction * buckets)
    return df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets)) < cutoff)


def pack_token_stream(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
) -> DataFrame:
    """Sequence packing, concat-stream form: documents are laid out in
    ``order_col`` order as one virtual token stream and cut into
    ``capacity``-token bins — each doc reports (n_tokens, start_offset,
    bin_id = start_offset div capacity). This is the standard
    concat-then-chunk packing used to build fixed-length training
    sequences; a doc whose span crosses a bin boundary is the split/
    truncate case downstream tokenization handles.

    The running offset is a GLOBAL prefix sum, computed distributed
    (operators/ordered.py: range-partitioned parallel sort + broadcast
    per-partition offsets) — globally-ordered packing no longer costs a
    single-partition window; ``pack_token_stream_sharded`` remains the
    per-shard variant when independent shard streams are wanted.
    The closed-bin greedy variant (open a new bin when the next doc
    doesn't fit) is a sequential recurrence, deliberately not offered:
    it cannot be expressed as a distributed plan without serializing
    the corpus through one task.
    """
    from .ordered import rank_cumsum

    order_col = order_col or id_col
    n_tok = T.n_tokens(F.col(text_col)).cast("long")
    # carry order_col through the projection when it isn't the id — the
    # prefix sum orders by it after the select
    cols = [F.col(id_col), n_tok.alias("n_tokens")]
    extra = [order_col] if order_col != id_col else []
    cum = rank_cumsum(
        docs.select(*cols, *extra),
        [F.col(order_col).asc()],
        rank_col=None,
        cumsums={"__cum": F.col("n_tokens")},
    )
    return (
        cum.withColumn("start_offset", F.col("__cum") - F.col("n_tokens"))
        .withColumn("bin_id", F.expr(f"start_offset div {int(capacity)}"))
        .drop("__cum", *extra)
    )


def pack_token_stream_sharded(
    docs: DataFrame,
    capacity: int,
    shard_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
) -> DataFrame:
    """Sequence packing, sharded form — the 100 TB path. Instead of one
    global token stream (``pack_token_stream``'s single total sort), each
    shard (source, date partition, hash bucket — any column whose
    cardinality ≥ cluster parallelism) is packed independently: the
    running-sum window partitions by ``shard_col``, so the plan is one
    hash shuffle on the shard key followed by per-shard sorts that run in
    parallel across executors. No single-partition Exchange anywhere.

    Bin ids are per-shard (the output key is ``(shard, bin_id)``): a
    training job reading packed sequences consumes shards independently,
    so a global bin numbering would only re-serialize what sharding just
    parallelized. Trade-off vs the global form: up to one partially-
    filled final bin per shard instead of one total — negligible when
    shards hold many bins.

    Pinned by a plan-shape test (``tests/test_plan_shapes.py``): the
    Window's partition spec must stay non-empty.
    """
    order_col = order_col or id_col
    w = (
        Window.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = T.n_tokens(F.col(text_col)).cast("long")
    cols = [F.col(shard_col).alias("shard"), F.col(id_col), n_tok.alias("n_tokens")]
    extra = [order_col] if order_col != id_col else []
    return (
        docs.select(*cols, *extra)
        .withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("bin_id", F.expr(f"start_offset div {int(capacity)}"))
        .drop(*extra)
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training doc that shares at
    least one ``k``-word shingle with the eval set (the standard 13-gram
    overlap rule). Output: train rows + ``is_contaminated`` boolean.

    Scale shape: the eval side is tiny relative to the corpus — its
    distinct shingle set broadcasts, so contamination detection is a
    broadcast LEFT SEMI join on the exploded train shingles (no shuffle
    of the corpus; the explode is the one map-side expansion) followed by
    a broadcast join of the contaminated-id set back onto the train rows.
    Nothing corpus-sized ever shuffles.
    """
    from .dedup import doc_shingles

    ev_shingles = F.broadcast(
        doc_shingles(eval_docs, id_col, text_col, k).select("shingle").distinct()
    )
    contaminated = (
        doc_shingles(train_docs, id_col, text_col, k)
        .join(ev_shingles, "shingle", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        train_docs.join(F.broadcast(contaminated), id_col, "left")
        .withColumn("is_contaminated", F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level top-``k`` word n-grams by occurrence count (with the
    number of distinct docs containing each) — the vocabulary/boilerplate
    census run before choosing dedup and quality thresholds.

    Shape: map-side explode to n-gram rows, partial-agg count (the
    shuffle carries ~|distinct n-grams| rows, not the corpus), then a
    TakeOrderedAndProject top-k — no global sort materializes. Ties
    break on the n-gram string so the cut is deterministic. Docs with
    fewer than ``n`` tokens contribute no n-grams (filtered before the
    explode — word_shingles' sequence() would otherwise descend).
    """
    w = T.tokens(F.col(text_col))
    grams = docs.filter(F.size(w) >= n).select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.word_shingles(w, n)).alias("ngram"),
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(k)
    )


def source_mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus share and temperature-scaled sampling weight —
    the domain-mixing table a pretraining job samples from. Emits, per
    source: doc count, token count, ``token_share`` (exact fraction of
    the corpus token stream), and ``alpha_half_weight`` =
    sqrt(token_share), the α=0.5 temperature weight that upsamples small
    sources (normalize the column downstream to draw probabilities).

    Determinism: token totals are exact integer sums, the share is a
    single IEEE division, and sqrt is correctly rounded — no
    accumulation-order-dependent float sums cross engines (normalizing
    by Σ√ here would reintroduce one; that Σ is over ~#sources values,
    so any consumer can do it driver-side, deterministically, on this
    output). Shape: one partial-agg groupBy on the source key plus a
    broadcast 1-row total — the corpus shuffles nothing but per-source
    partial sums.
    """
    n_tok = T.n_tokens(F.col(text_col)).cast("long")
    per_src = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
    )
    total = docs.agg(F.sum(n_tok).alias("__total_tokens"))
    share = F.col("n_tokens") / F.col("__total_tokens")
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(F.sqrt(share), 6).alias("alpha_half_weight"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` rarity-weighted terms per document: score = tf · N / df
    (term frequency scaled by inverse document frequency, linear form —
    one exact-integer product and one IEEE division, bit-deterministic
    across engines where log-based idf is not).

    The inverted-index shape: explode to (doc, term), partial-agg tf,
    broadcast-join the (term, df) side back. df is |vocab| rows —
    broadcastable at any corpus size that has a natural-language
    vocabulary; the doc-side shuffle is the unavoidable index build.
    Output: (doc_id, term, tf, df, score rounded 6dp, rank), rank by
    score desc then term asc for determinism.
    """
    terms = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(T.tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_counts = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # Corpus size rides a broadcast 1-row cross join — stays lazy, no
    # driver-side count action at plan-build time.
    n_docs = docs.agg(F.countDistinct(id_col).alias("__n_docs"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * F.col("__n_docs") / F.col("df"), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def unigram_logprob_score(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    add-alpha-smoothed unigram LM — the cheap LM-quality signal (CCNet's
    perplexity filter, degree 1): degenerate/boilerplate docs score high
    (their tokens are corpus-frequent), rare-garbage docs score low.
    perplexity = exp(-mean_logprob).

    Shape (100 TB): token counts are one vocab-sized shuffle with map-side
    partial agg; per-doc term frequencies shuffle on (doc, token); the LM
    joins back ON TOKEN (shuffle join — at corpus scale the vocabulary
    exceeds broadcast thresholds; Catalyst broadcasts it automatically
    when small); the final per-doc sum shuffles on doc id. Corpus totals
    (T, V) are two scalars from one aggregate, literalized into the plan.

    Cross-engine determinism: per-(doc, token-type) contributions
    tf·ln(p) quantize to BIGINT micro-units before the per-doc sum
    (associativity-free); one final division by 1e6·dl.
    """
    base = docs.select(F.col(id_col).alias("id"), T.tokens(F.col(text_col)).alias("w")).filter(
        F.size("w") > 0
    )
    postings = base.select("id", F.size("w").alias("dl"), F.explode("w").alias("t"))
    counts = postings.groupBy("t").agg(F.count("*").alias("c"))
    totals = counts.agg(F.sum("c").alias("total"), F.count("*").alias("vocab")).collect()[0]
    denom = float(totals.total) + alpha * float(totals.vocab)
    tf = postings.groupBy("id", "t").agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    contrib = tf.join(counts, "t").withColumn(
        "micro",
        F.round(F.col("tf") * F.log((F.col("c") + alpha) / F.lit(denom)) * 1e6).cast("long"),
    )
    return (
        contrib.groupBy("id")
        .agg((F.sum("micro") / 1e6 / F.first("dl")).alias("mean_logprob"), F.first("dl").alias("n_tokens"))
        .select(F.col("id").alias(id_col), "n_tokens", "mean_logprob")
    )


def resample_temperature(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based source resampling — materializes the α-mixture
    that ``source_mixture_weights`` only computes: downsample each source
    so the surviving token distribution is ∝ share^α (α < 1 flattens the
    mix toward small sources; the multilingual-pretraining standard).

    One-epoch, no-upsampling form: keep_rate(s) = (min_tokens /
    tokens_s)^(1-α) — the smallest source keeps everything, larger
    sources are thinned by exactly the factor that makes post-sample
    token mass ∝ share^α. The keep decision is a deterministic portable
    hash: u(doc) = first 8 md5 hex chars of the doc id read as u32 /
    2^32, keep iff u < rate — stable across runs, partitionings, AND
    engines (DuckDB computes the identical u), so the declared query
    hash-checks end-to-end.

    For α = 0.5 (the declared default) the rate is sqrt(min_tok/tok_s):
    IEEE sqrt is correctly rounded, so the rate is bit-identical in both
    engines. Other α go through pow(), whose last-ULP behavior is
    libm-dependent — fine in production, not oracle-pinned.

    Plan: per-source token counts are a map-side partial agg into a
    source-cardinality table; rates broadcast back; the corpus filter is
    a narrow map-side pass. The 100 TB corpus never shuffles.
    """
    n_tok = T.n_tokens(F.col(text_col)).cast("long")
    counts = docs.groupBy(source_col).agg(F.sum(n_tok).alias("n_tok"))
    min_tok = counts.agg(F.min("n_tok").alias("min_tok"))
    ratio = F.col("min_tok").cast("double") / F.col("n_tok")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    rates = counts.crossJoin(F.broadcast(min_tok)).withColumn("keep_rate", rate)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(rates.select(source_col, "keep_rate")), source_col)
        .where(u < F.col("keep_rate"))
        .select(
            F.col(id_col),
            F.col(source_col),
            F.round(F.col("keep_rate"), 6).alias("keep_rate"),
        )
    )


def shuffle_training_order(
    docs: DataFrame,
    seed: int = 0,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle — the epoch
    permutation step of a pretraining data pipeline. Each doc gets a
    pseudo-random position derived ONLY from (seed, id): h = md5(seed ':'
    id); shard = first 8 hex chars as u32 mod n_shards; in-shard order =
    the next 16 hex chars compared lexicographically (ties broken by id).
    The global order is (shard, pos) — exactly the shard-files +
    in-shard-order layout a distributed training job consumes, and
    reproducible from nothing but the seed: same permutation on any
    cluster, any partitioning, any engine (the oracle replays it in SQL
    md5).

    Plan: one hash shuffle on the shard key, then per-shard window sorts
    that run in parallel — no global sort, no SinglePartition exchange
    (a single total ORDER BY would serialize the corpus through one
    task; sharding is the scale form, like pack_token_stream_sharded).
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy("okey", id_col)
    return (
        docs.select(F.col(id_col), shard, F.substring(h, 9, 16).alias("okey"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("okey")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the context-window chunking step that turns raw documents into
    training/embedding sequences (chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_size)``; ``stride < chunk_size``
    gives overlap, ``stride == chunk_size`` gives disjoint blocks).

    Output: one row per (doc, chunk) with ``chunk_id`` (0-based),
    ``chunk_tokens`` (actual length — the final chunk may be short) and
    ``chunk_text``. The last start is the smallest one whose chunk
    reaches the document end (``ceil((len - chunk_size) / stride)``), so
    every token is covered and no tail chunk is wholly contained in its
    predecessor — the standard sliding-window rule.

    Plan: narrow map-side expansion only — split, a bounded ``sequence``
    explode (ceil(len/stride) chunk starts per doc), ``slice`` +
    ``array_join``. No shuffle, no Python; the 100 TB corpus streams
    through whole-stage codegen and the expansion factor is exactly the
    chunk overlap the caller asked for.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    d = docs.select(F.col(id_col), toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    # last start = smallest s*stride with s*stride + chunk_size >= n
    last_id = F.greatest(
        F.lit(0), F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride)))
    ).cast("int")
    d = d.select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(F.sequence(F.lit(0), last_id)).alias("chunk_id"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return d.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(piece).cast("long").alias("chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def decontaminate_bloom(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    n_bits: int = 8192,
    n_hashes: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-filter decontamination — the scale form of ``decontaminate``
    for when the eval set's distinct shingle strings outgrow a broadcast
    (many benchmarks x many contamination windows). The eval shingles
    collapse into a fixed ``n_bits``-bit Bloom bitset (``n_bits/64``
    longs — size chosen by the caller, independent of eval size); train
    shingles probe it. One-sided error: never misses a real overlap,
    may over-flag at the classic ``(1-e^{-kn/m})^k`` false-positive rate
    (bounded in tests/test_llm_ops.py against the exact operator).

    Engine-portable by construction: bit positions come from md5 of
    ``"j:shingle"`` (first 15 hex chars as a 60-bit int, mod ``n_bits``)
    — DuckDB computes the identical positions, so the declared query
    hash-checks end-to-end, false positives included.

    Plan: the bitset build is a partial-agg shuffle of ≤ ``n_bits/64``
    word rows; the probe is ``n_hashes`` map-side broadcast hash joins
    of the corpus's shingle stream against that word table — no explode,
    no corpus-sized shuffle anywhere; only flagged doc ids (tiny)
    aggregate.
    """
    from .dedup import doc_shingles

    def pos(j: int) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))), 1, 15), 16, 10
            ).cast("bigint")
            % n_bits
        )

    ev_pos = doc_shingles(eval_docs, id_col, text_col, k).select("shingle").distinct()
    ev_words = (
        ev_pos.select(F.explode(F.array(*[pos(j) for j in range(1, n_hashes + 1)])).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("word"),
            # SQL form: the Python shiftleft() wrapper only takes a literal
            # shift amount, the SQL function takes a column
            F.expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.col("b")).alias("mask"))
        # materialize the (≤ n_bits/64)-row bitset once: each of the
        # n_hashes probe joins broadcasts it, and without a checkpoint
        # Spark would re-run the whole eval-shingle build per join
        .localCheckpoint(eager=False)
    )
    probe = doc_shingles(train_docs, id_col, text_col, k).select(
        "id", *[pos(j).alias(f"__p{j}") for j in range(1, n_hashes + 1)]
    )
    all_hit = F.lit(True)
    for j in range(1, n_hashes + 1):
        w_j = F.broadcast(
            ev_words.select(
                F.col("word").alias(f"__w{j}"), F.col("mask").alias(f"__m{j}")
            )
        )
        probe = probe.join(
            w_j, (F.col(f"__p{j}") / 64).cast("int") == F.col(f"__w{j}"), "left"
        )
        hit_j = F.col(f"__m{j}").isNotNull() & F.expr(
            f"(shiftright(__m{j}, cast(__p{j} % 64 as int)) & 1) = 1"
        )
        all_hit = all_hit & hit_j
    flagged = probe.filter(all_hit).select("id").distinct()
    return (
        train_docs.join(
            F.broadcast(flagged.withColumnRenamed("id", id_col).withColumn("__hit", F.lit(True))),
            id_col,
            "left",
        )
        .withColumn("is_contaminated", F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


def linear_quality_score(
    docs: DataFrame,
    n_features: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick linear text classifier scoring — the model-based
    quality-filter shape (fastText / logistic-regression style): each
    token hashes into one of ``n_features`` buckets, each bucket carries
    an integer weight in [-1000, 1000], a document's margin is the sum
    of its token weights and the score normalizes by length. Here the
    weight table is a deterministic md5 stub (weight(b) = md5-derived
    int of the bucket id) — production swaps in trained weights, the
    plumbing (feature hashing, weight lookup, per-doc reduction) is
    identical.

    Scale shape: the weight "lookup" folds into the per-row expression
    (weights derive from the bucket id), so scoring is a zero-shuffle
    whole-stage-codegen map — no explode, no join, no Python. With a
    trained table instead, the weight array broadcasts and the lookup
    stays map-side. Margins sum as exact integers (order-independent),
    so the score is bit-stable across partitionings and engines; the
    DuckDB oracle replays it exactly.
    """
    # bucket(t) = md5-u32(t) % n_features; weight(b) = md5-u32('w:'||b) % 2001 - 1000
    margin_sql = (
        f"aggregate(transform(split({text_col}, ' '), t -> "
        "(cast(conv(substring(md5(concat('w:', cast("
        f"cast(conv(substring(md5(t),1,8),16,10) as bigint) % {n_features}"
        " as string))),1,8),16,10) as bigint) % 2001) - 1000), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.expr(margin_sql).alias("margin"),
    ).withColumn(
        # one IEEE division of two exact integers — bit-identical in any
        # engine, no rounding rule to disagree on (Spark HALF_UP vs
        # DuckDB HALF_EVEN differ on exact .5 at the cut digit)
        "quality",
        F.col("margin") / (1000.0 * F.col("n_tokens")),
    )


def pps_systematic_sample(
    docs: DataFrame,
    n_per_shard: int,
    shard_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Weighted sampling, PPS-systematic form: within each shard, draw
    exactly ``n_per_shard`` picks with inclusion probability
    proportional to size (token count) — the classic way to build a
    token-budgeted subset where long documents are proportionally more
    likely, without any RNG. Lay the shard's docs on a line in id order,
    each occupying a segment as long as its weight; drop ``n`` equally
    spaced pins; a doc is picked once per pin in its segment
    (``n_copies`` ≥ 2 means its weight exceeds the sampling step — the
    standard PPS multiplicity).

    Selection is pure integer arithmetic — pin j lands in doc i iff
    ``floor(cum_i·n/total) > floor(cum_{i-1}·n/total)`` — so the result
    is bit-identical on any engine/partitioning (no RNG, no floats; the
    determinism-by-id also makes the draw reproducible run to run).
    Guard ``cum·n`` against int64 at extreme scale (ANSI mode throws
    rather than wraps); shard totals in the trillions with n in the
    thousands still fit.

    Plan: per-shard windows only (cumsum + shard total) — one hash
    shuffle on the shard key, parallel per-shard sorts, never a
    SinglePartition sort (the pack_token_stream_sharded doctrine).
    """
    n_tok = T.n_tokens(F.col(text_col)).cast("long")
    w_cum = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("shard")
    d = (
        docs.select(F.col(shard_col).alias("shard"), F.col(id_col), n_tok.alias("weight"))
        .withColumn("cum", F.sum("weight").over(w_cum))
        .withColumn("total", F.sum("weight").over(w_all))
    )
    # integer division, not floor(float-div): floor(a/b) on doubles loses
    # exactness past 2^53 and a/b already differs last-ulp across engines;
    # a div b on positive longs is the same value, computed exactly
    n = int(n_per_shard)
    picks = F.expr(f"(cum * {n}) div total") - F.expr(f"((cum - weight) * {n}) div total")
    return (
        d.withColumn("n_copies", picks.cast("long"))
        .filter(F.col("n_copies") >= 1)
        .select("shard", id_col, "weight", "n_copies")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profiling — the ANALYZE-statistics step a pipeline
    runs before choosing join strategies, partition keys and quality
    thresholds: per column, row count, null count, exact distinct count,
    and min/max (stringified so heterogeneous column types share one
    output schema).

    Plan: a single aggregation over one scan — every non-distinct
    statistic combines map-side; the distinct counts ride Spark's
    multi-distinct Expand (one shuffle total, not one per column). The
    wide 1-row aggregate then unpivots to one row per column via stack;
    output is |cols| rows regardless of table size.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __n_{c}, __nulls_{c}, __ndv_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) as "
            "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
    max_symbol_ratio: float = 0.1,
    max_dup_bigram_ratio: float = 0.2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, Appendix A) as one composite
    per-document filter — the standard pretraining heuristic gate: word
    count bounds, mean word length 3-10, >=80% alphabetic words, >=2
    stopwords, #/ellipsis symbol ratio <=0.1, plus the repeated-bigram
    gate (token-count analogue of the paper's character-fraction rule).

    Returns one row per doc with the raw signals, one boolean per rule,
    and ``passes`` = AND of all rules — keep the signals, not just the
    verdict, so threshold sweeps re-filter without rescanning text.

    Scale design: every signal is an in-array lambda / string-length
    expression over the tokenized text — a NARROW codegen projection,
    no explode, no shuffle, no UDF; the corpus streams through one scan.
    Determinism: ratios are int/int double divisions rounded to 6 dp,
    identical cross-engine; rule booleans compare those rounded values.
    """
    w = T.tokens(F.col(text_col))
    n = F.size(w)
    txt = F.col(text_col)
    mean_len = F.round((F.length(txt) - (n - F.lit(1))) / n, 6)
    # "word contains an alphabetic char": measured per-signal at sf0.1,
    # rlike("[A-Za-z]") is the FASTEST form (0.15s vs 0.27s for a
    # translate-strip length compare) — the single-char-class regex
    # short-circuits at the first letter, while translate must scan every
    # char of every token. The gate's real cost is tokenization + the
    # dup-bigram signal, optimized in dup_ngram_fraction.
    alpha = F.round(
        F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]"))) / n, 6
    )
    n_stop = T.stopword_count(txt).cast("long")
    hashes = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    ellipses = (F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / F.lit(3)
    symbol = F.round((hashes + ellipses) / n, 6)
    dup_bg = F.when(n >= 2, F.round(T.dup_ngram_fraction(w, 2), 6)).otherwise(F.lit(0.0))
    out = docs.select(
        id_col,
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha.alias("alpha_word_ratio"),
        n_stop.alias("n_stopwords"),
        symbol.alias("symbol_ratio"),
        dup_bg.alias("dup_bigram_ratio"),
    )
    rules = {
        "ok_word_count": F.col("n_words").between(min_words, max_words),
        "ok_mean_word_len": F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len),
        "ok_alpha": F.col("alpha_word_ratio") >= min_alpha_ratio,
        "ok_stopwords": F.col("n_stopwords") >= min_stopwords,
        "ok_symbol": F.col("symbol_ratio") <= max_symbol_ratio,
        "ok_repetition": F.col("dup_bigram_ratio") <= max_dup_bigram_ratio,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    verdict = None
    for name in rules:
        verdict = F.col(name) if verdict is None else verdict & F.col(name)
    return out.withColumn("passes", verdict)


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[tuple[str, int], ...] = (("train", 9000), ("val", 500), ("test", 500)),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-splitting
    step of a training pipeline, done the way it must be at 100 TB:
    derived ONLY from (salt, key), no RNG, no state. The same key gets
    the same split on any cluster, any partitioning, any engine, and —
    because the hash is keyed, not positional — in ANY TABLE: sampling
    docs and their embeddings on the same key keeps the splits aligned
    (no eval-set leakage through a side table). Changing ``salt``
    reshuffles all assignments atomically (split versioning).

    ``weights`` are (name, per-ten-thousand) in priority order and must
    sum to 10000. Hash = first 8 md5 hex chars of ``salt ':' key`` as a
    u32 (portable: DuckDB replays it exactly), bucket = u32 mod 10000,
    split by cumulative threshold. A NARROW zero-shuffle projection.
    """
    out = df.select(
        F.col(key_col), split_bucket_col(F.col(key_col), salt).alias("bucket")
    )
    return out.withColumn("split", split_col(F.col("bucket"), weights))


def split_bucket_col(key, salt: str):
    """The portable hash bucket behind ``split_assign`` as a bare Column
    — first 8 md5 hex chars of ``salt ':' key`` as a u32, mod 10000."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % 10000


def split_col(bucket, weights: tuple[tuple[str, int], ...]):
    """Cumulative-threshold split name for a 0-9999 ``bucket`` Column —
    exposed so composing queries (A/B readouts, eval slicing) can
    assign inline as a NARROW projection instead of joining back
    against a ``split_assign`` output."""
    total = sum(w for _, w in weights)
    if total != 10000:
        raise ValueError(f"weights must sum to 10000, got {total}")
    split = None
    cum = 0
    for name, w in weights[:-1]:
        cum += w
        cond = bucket < cum
        split = F.when(cond, name) if split is None else split.when(cond, name)
    return F.lit(weights[0][0]) if split is None else split.otherwise(weights[-1][0])


def bigram_logprob_score(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean CONDITIONAL log-probability under the corpus's
    own add-alpha bigram LM — degree 2 of the CCNet-style perplexity
    filter (``unigram_logprob_score`` is degree 1): P(wᵢ|wᵢ₋₁) =
    (c(wᵢ₋₁wᵢ)+α)/(c(wᵢ₋₁)+α·V), scored over the dl−1 transitions, so
    word-salad with frequent tokens in impossible ORDER — invisible to
    the unigram filter — scores low. Docs with <2 tokens drop (no
    transition to score).

    Shape (100 TB): bigram and unigram counts are two vocab-sized
    partial-agg shuffles; the LM joins back on bigram then on the
    PREVIOUS token; per-doc sums shuffle on doc id. V is one scalar,
    literalized. Per-(doc, bigram-type) contributions quantize to BIGINT
    micro-units before the per-doc sum (associativity-free).
    """
    base = docs.select(
        F.col(id_col).alias("id"), T.tokens(F.col(text_col)).alias("w")
    ).filter(F.size("w") >= 2)
    toks = base.select("id", F.explode("w").alias("t"))
    c1 = toks.groupBy("t").agg(F.count("*").alias("c1"))
    vocab = float(c1.count())  # 1-row scalar job, literalized below
    bgs = base.select(
        "id",
        (F.size("w") - 1).alias("nb"),
        F.explode(T.word_shingles(F.col("w"), 2)).alias("bg"),
    )
    c2 = bgs.groupBy("bg").agg(F.count("*").alias("c2"))
    tf2 = bgs.groupBy("id", "bg").agg(
        F.count("*").alias("tf"), F.first("nb").alias("nb")
    )
    contrib = (
        tf2.join(c2, "bg")
        .withColumn("prev", F.element_at(F.split(F.col("bg"), " "), 1))
        .join(c1.select(F.col("t").alias("prev"), "c1"), "prev")
        .withColumn(
            "micro",
            F.round(
                F.col("tf")
                * F.log((F.col("c2") + alpha) / (F.col("c1") + F.lit(alpha * vocab)))
                * 1e6
            ).cast("long"),
        )
    )
    return (
        contrib.groupBy("id")
        .agg(
            (F.sum("micro") / 1e6 / F.first("nb")).alias("mean_cond_logprob"),
            (F.first("nb") + 1).cast("long").alias("n_tokens"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "mean_cond_logprob")
    )


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-token collocations ranked by pointwise mutual
    information — the phrase-mining signal (PMI = ln(p(x,y)/(p(x)p(y))))
    that separates real multiword expressions from merely-frequent
    bigrams (top_ngrams ranks "of the" first; PMI ranks it last).

    Determinism (registry rules): ln is monotone, so ranking by PMI is
    ranking by the exact rational (c_xy * N) / (c_x * c_y). Both factors
    are exact BIGINT products of integer counts; the only float op is
    ONE division — bit-identical cross-engine, no ln, no float sums.
    Marginals c_x (left slot) and c_y (right slot) are sums over the
    bigram-position table itself, so the probability space is
    self-consistent (Σ_x c_x = Σ_y c_y = N).

    Shape: narrow zip-shift pair build (no positional explode), one
    corpus-wide groupBy(t1, t2) whose shuffle carries ~|distinct
    bigrams| rows after partial aggregation, then BOTH marginals and the
    N scalar derive from that counts table (vocab-sized — never a second
    corpus pass), broadcast back. TakeOrderedAndProject top-k.
    """
    w = T.tokens(F.col(text_col))
    shifted = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(1)))
    pair_arr = F.slice(
        F.zip_with(w, shifted, lambda a, b: F.struct(a.alias("t1"), b.alias("t2"))),
        1,
        F.size(w) - 1,
    )
    pairs = docs.filter(F.size(w) >= 2).select(F.explode(pair_arr).alias("p"))
    counts = pairs.groupBy(
        F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2")
    ).agg(F.count("*").alias("pair_cnt"))
    total = counts.agg(F.sum("pair_cnt").alias("n"))
    left = counts.groupBy("t1").agg(F.sum("pair_cnt").alias("left_cnt"))
    right = counts.groupBy("t2").agg(F.sum("pair_cnt").alias("right_cnt"))
    ratio = (F.col("pmi_num").cast("double") / F.col("pmi_den").cast("double"))
    return (
        counts.filter(F.col("pair_cnt") >= min_count)
        .join(F.broadcast(left), "t1")
        .join(F.broadcast(right), "t2")
        .crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            F.col("pair_cnt").cast("long").alias("pair_cnt"),
            F.col("left_cnt").cast("long").alias("left_cnt"),
            F.col("right_cnt").cast("long").alias("right_cnt"),
            (F.col("pair_cnt") * F.col("n")).cast("long").alias("pmi_num"),
            (F.col("left_cnt") * F.col("right_cnt")).cast("long").alias("pmi_den"),
        )
        .withColumn("pmi_ratio", F.round(ratio, 6))
        .orderBy(ratio.desc(), "t1", "t2")
        .limit(k)
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "aes-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — the Efraimidis-Spirakis
    A-ES reservoir scheme (IPL 2006), derandomized the split_assign way:
    each row's uniform draw u comes from md5(salt ':' id), its priority
    is u^(1/w), and the sample is the global top-k by priority. Unlike
    pps_systematic_sample (with-replacement multiplicities inside a
    shard), this yields k DISTINCT rows whose inclusion is
    probability-proportional-to-weight, reproducible from the salt alone
    on any engine or partitioning.

    Exactness: rank by ln(u)/w (monotone in u^(1/w)); ln quantizes to
    integer micro-nats FIRST (the repo's Naive-Bayes/Kaplan-Meier
    idiom), so the sort key is one division of exact integers — the
    same IEEE double everywhere. u = (u32+1)/2^32 ∈ (0, 1], never
    ln(0).

    Plan: a narrow zero-shuffle projection + global top-k
    (TakeOrderedAndProject — k rows per partition merge on the driver;
    no global sort). Non-positive weights are excluded (a zero-weight
    row has inclusion probability 0 by definition).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    lnu_micro = F.round(F.log((u32 + 1) / F.lit(4294967296.0)) * 1e6).cast("long")
    w = F.col(weight_col).cast("long")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            w.alias("weight"),
            (lnu_micro.cast("double") / w).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def log_odds_keyness(
    toks: DataFrame,
    token_col: str,
    flag_col: str,
    min_count: int = 5,
    top_n: int = 25,
) -> DataFrame:
    """Keyness — which tokens are DISTINCTIVE of one sub-corpus vs the
    rest ("Fightin' Words", Monroe et al. 2008, the add-0.5 Haldane
    variant): the corpus-comparison tool behind domain audits ("what
    does this source talk about that the others don't"). For token w
    with count y1 in the target corpus (n1 tokens) and y2 elsewhere
    (n2):

        delta = ln((y1+.5)/(n1-y1+.5)) - ln((y2+.5)/(n2-y2+.5))
        z     = delta / sqrt(1/(y1+.5) + 1/(n1-y1+.5)
                             + 1/(y2+.5) + 1/(n2-y2+.5))

    ``flag_col`` is 1 for target-corpus rows, 0 otherwise; tokens with
    fewer than ``min_count`` total occurrences are pruned before
    scoring (rare-token z-scores are noise). Top-N by |z| with sign
    kept, ties by token ascending.

    Determinism: counts are exact BIGINTs; delta/z are one fixed chain
    of double ops over those integers, rounded 6 dp pre-sort. Scale:
    ONE vocab-sized partial-aggregable groupBy (conditional sums — no
    pivot), totals broadcast back from a 1-row aggregate, top-N via
    TakeOrderedAndProject.
    """
    if top_n <= 0 or min_count < 1:
        raise ValueError("need top_n > 0 and min_count >= 1")
    y = F.col(flag_col).cast("long")
    counts = (
        toks.select(F.col(token_col).alias("token"), y.alias("y"))
        .groupBy("token")
        .agg(
            F.sum("y").alias("y1"),
            (F.count(F.lit(1)) - F.sum("y")).alias("y2"),
        )
        .filter((F.col("y1") + F.col("y2")) >= min_count)
    )
    tot = counts.agg(
        F.sum("y1").alias("n1"), F.sum("y2").alias("n2")
    )
    t = counts.crossJoin(F.broadcast(tot))
    a1 = F.col("y1").cast("double") + F.lit(0.5)
    b1 = (F.col("n1") - F.col("y1")).cast("double") + F.lit(0.5)
    a2 = F.col("y2").cast("double") + F.lit(0.5)
    b2 = (F.col("n2") - F.col("y2")).cast("double") + F.lit(0.5)
    delta = F.log(a1 / b1) - F.log(a2 / b2)
    z = delta / F.sqrt(1 / a1 + 1 / b1 + 1 / a2 + 1 / b2)
    return (
        t.select(
            "token",
            F.col("y1").cast("long").alias("n_target"),
            F.col("y2").cast("long").alias("n_rest"),
            F.round(delta, 6).alias("log_odds"),
            F.round(z, 6).alias("z_score"),
        )
        .orderBy(F.abs(F.col("z_score")).desc(), F.col("token").asc())
        .limit(top_n)
    )


def contamination_coverage(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Contamination SEVERITY report — the graded companion to the
    binary ``decontaminate`` gate: for every train document that shares
    at least one k-shingle with the eval set, the FRACTION of its
    distinct shingles that appear there. A doc at 0.02 shares a stock
    phrase; a doc at 0.9 IS the eval item — the gate drops both, this
    report says which, so the threshold debate is data, not vibes.

    Scale shape: identical to the gate — the eval shingle set is tiny
    and broadcasts; the corpus-sized side is ONE distinct-shingle
    explode probed map-side; per-doc totals and hits are two
    partial-aggregable groupBys on the doc key. Coverage is one
    int/int division. Output: (doc_id, n_shingles, n_hit, coverage),
    hit docs only.
    """
    from .dedup import doc_shingles

    ev = (
        doc_shingles(eval_docs, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    tr = doc_shingles(train_docs, id_col, text_col, k)
    sizes = tr.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_shingles"))
    hits = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        hits.join(sizes, "id")
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_hit",
            (F.col("n_hit") / F.col("n_shingles")).alias("coverage"),
        )
    )


def zipf_fit(
    toks: DataFrame,
    token_col: str,
    top_k: int = 1000,
) -> DataFrame:
    """Zipf-law conformity fit — the corpus-naturalness screen: natural
    language's token frequencies follow freq ∝ rank^s with s ≈ −1;
    machine-generated/boilerplate corpora bend the line. Fits OLS of
    ln(freq) on ln(rank) over the top-``top_k`` tokens and reports
    (slope, intercept, r2, n_points).

    Determinism: counts are exact; the top-k cut is
    TakeOrderedAndProject under (cnt DESC, token ASC); ln values
    quantize to integer micro-nats BEFORE the regression sums (the
    entropy pattern), so the five OLS sums are exact BIGINT/DECIMAL
    and slope/intercept/r² are single divisions. The rank window runs
    over top_k rows only — never the vocabulary.
    """
    if top_k < 3:
        raise ValueError(f"top_k must be >= 3, got {top_k}")
    counts = (
        toks.select(F.col(token_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    pts = counts.withColumn("rank", F.row_number().over(w)).select(
        F.round(F.log(F.col("rank").cast("double")) * 1e6).cast("long").alias("lx"),
        F.round(F.log(F.col("cnt").cast("double")) * 1e6).cast("long").alias("ly"),
    )
    dec = "decimal(38,0)"
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum((F.col("lx") * F.col("lx")).cast(dec)).alias("sxx"),
        F.sum((F.col("lx") * F.col("ly")).cast(dec)).alias("sxy"),
        F.sum((F.col("ly") * F.col("ly")).cast(dec)).alias("syy"),
    )
    d = lambda c: F.col(c).cast(dec)  # noqa: E731
    num = d("n") * F.col("sxy") - d("sx") * d("sy")
    denx = d("n") * F.col("sxx") - d("sx") * d("sx")
    deny = d("n") * F.col("syy") - d("sy") * d("sy")
    ok = (F.col("n") >= 3) & (denx != 0)
    slope = num.cast("double") / denx.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double") / 1e6
    r2 = F.when(
        ok & (deny != 0),
        (num.cast("double") * num.cast("double"))
        / (denx.cast("double") * deny.cast("double")),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_points"),
        F.when(ok, F.round(slope, 6)).alias("slope"),
        F.when(ok, F.round(intercept, 6)).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def js_divergence(
    toks: DataFrame,
    token_col: str,
    flag_col: str,
) -> DataFrame:
    """Jensen-Shannon divergence between a target sub-corpus's token
    distribution and the rest — the bounded, symmetric drift scalar
    next to PSI (which needs binnable numerics) and keyness (which
    ranks tokens but gives no single distance): JSD = ½KL(P‖M) +
    ½KL(Q‖M), M = (P+Q)/2, always in [0, ln 2] and defined even where
    one side has zero-count tokens (0·ln0 = 0 — no smoothing needed,
    unlike raw KL).

    ``flag_col`` is 1 for target rows. Determinism: per-token KL
    contributions are one fixed double chain over exact BIGINT counts,
    nano-quantized before the vocab-wide sums (the PSI discipline).
    Plan: ONE vocab-sized partial-aggregable groupBy (conditional
    sums), a 1-row totals broadcast, one fold. Output: one row —
    vocab size, per-side token totals, jsd_nats, jsd_bits.
    """
    y = F.col(flag_col).cast("long")
    counts = (
        toks.select(F.col(token_col).alias("token"), y.alias("y"))
        .groupBy("token")
        .agg(
            F.sum("y").alias("y1"),
            (F.count(F.lit(1)) - F.sum("y")).alias("y2"),
        )
    )
    tot = counts.agg(F.sum("y1").alias("n1"), F.sum("y2").alias("n2"))
    t = counts.crossJoin(F.broadcast(tot))
    # greatest(n, 1): ANSI mode raises on double x/0 (and codegen hoists
    # subexpressions out of CASE guards); an empty side has all-zero
    # counts, so the clamped divisor still yields the correct q = 0
    p = F.col("y1").cast("double") / F.greatest(F.col("n1"), F.lit(1)).cast("double")
    q = F.col("y2").cast("double") / F.greatest(F.col("n2"), F.lit(1)).cast("double")
    tp = F.when(
        F.col("y1") > 0, F.round(p * F.log(2 * p / (p + q)) * 1e9)
    ).otherwise(F.lit(0.0)).cast("decimal(38,0)")
    tq = F.when(
        F.col("y2") > 0, F.round(q * F.log(2 * q / (p + q)) * 1e9)
    ).otherwise(F.lit(0.0)).cast("decimal(38,0)")
    agg = t.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(tp).alias("sp"),
        F.sum(tq).alias("sq"),
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    jsd = (F.col("sp").cast("double") + F.col("sq").cast("double")) / (2 * 1e9)
    return agg.select(
        F.col("vocab").cast("long").alias("vocab"),
        F.col("n1").cast("long").alias("n_tokens_target"),
        F.col("n2").cast("long").alias("n_tokens_rest"),
        F.round(F.when(ok, jsd), 6).alias("jsd_nats"),
        # ln 2 as a literal so both engines divide by the same double
        F.round(F.when(ok, jsd / 0.6931471805599453), 6).alias("jsd_bits"),
    )


def neyman_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    key_col: str,
    total_n: int,
    salt: str,
) -> DataFrame:
    """Neyman-allocation stratified sampling — the survey-statistics
    upgrade of proportional stratified sampling: a fixed budget of
    ``total_n`` rows is allocated to strata ∝ N_h·S_h (size × spread),
    so high-variance strata get the samples that actually reduce the
    estimator's variance. The right shape for building eval/inspection
    samples from a skewed corpus.

    Allocation: per-stratum (N_h, S_h) from one exact-integer pass
    (value in integer units; Σx, Σx² exact; S_h is one fixed double
    chain micro-quantized to a BIGINT weight), n_h = floor(total_n ·
    w_h / Σw) capped at N_h — deterministic, allocated ≤ total_n (the
    floor shortfall is the documented trade for exactness). Selection
    within a stratum is md5-hash order (salt:key), not RNG — stable
    across runs, engines, partitionings. Plan: one partial-agg pass,
    a broadcast of the tiny allocation table, one per-stratum window.
    Output: sampled rows (stratum, key, value) + the stratum's target.
    """
    if total_n < 1:
        raise ValueError("total_n must be positive")
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("v"),
    )
    stats = base.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("v").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("sxx"),
    )
    nh = F.col("nh")
    var = F.when(
        nh >= 2,
        (
            nh.cast("decimal(38,0)") * F.col("sxx")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
        ).cast("double")
        / (nh * (nh - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    w = stats.select(
        "stratum",
        "nh",
        F.round(nh.cast("double") * F.sqrt(var) * 1e6).cast("long").alias("wm"),
    )
    tot = w.agg(F.sum("wm").alias("wt"))
    alloc = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            F.least(
                F.when(
                    F.col("wt") > 0,
                    F.expr(f"({total_n} * wm) div wt"),
                ).otherwise(F.lit(0)),
                F.col("nh"),
            ).cast("long").alias("n_target"),
        )
    )
    h = F.md5(F.concat(F.lit(salt + ":"), F.col("key").cast("string")))
    wsel = Window.partitionBy("stratum").orderBy(h, F.col("key"))
    return (
        base.join(F.broadcast(alloc), "stratum")
        .withColumn("__rn", F.row_number().over(wsel))
        .filter(F.col("__rn") <= F.col("n_target"))
        .select("stratum", "key", F.col("v").alias(value_col), "n_target")
    )


def dsir_hashed_ngram_weights(
    docs: DataFrame,
    is_target,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): score every document by how much its hashed n-gram
    profile looks like the TARGET sub-corpus rather than the rest, the
    published recipe for picking pretraining data that matches a
    high-quality/domain target without training a classifier.

    Features are the paper's hashed n-grams: unigrams + bigrams of the
    whitespace token stream, md5-hashed into ``n_buckets`` buckets (the
    ``split_assign`` portable-hash family, so every engine computes the
    same bucket). With add-1 smoothing over bucket counts, bucket b
    gets log-ratio  ln p_b − ln q_b  (p from rows where ``is_target``,
    q from the rest), and a document's log importance weight is the
    feature-count-weighted sum  Σ_b c_b·(ln p_b − ln q_b).

    Determinism: all counts exact BIGINTs; each bucket's log-ratio
    quantizes to micro-units BEFORE the per-doc sum, so the sum is
    exact integer arithmetic on both engines (the entropy/logprob
    family's contract — the single ln is the one cross-libm surface,
    confirmed empirically by the oracle sweep).

    Scale (100 TB): gram explosion is map-side; bucket counts are ONE
    partial-aggregable groupBy over ≤ n_buckets rows; the log-ratio
    table is constant-bounded and broadcasts; the per-doc sum shuffles
    on (doc, bucket) then doc — no corpus-sized sort, no UDF anywhere.
    Resampling composes downstream: Gumbel-top-k via
    ``weighted_sample_topk`` or a threshold filter on the weight.

    Output: (``id_col``, n_grams BIGINT, logw_micro BIGINT) — every
    input document scored, target rows included (callers filter).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    B = int(n_buckets)
    base = docs.select(
        F.col(id_col).alias("id"),
        is_target.cast("long").alias("tgt"),
        T.tokens(F.col(text_col)).alias("w"),
    )
    grams = base.select(
        "id",
        "tgt",
        F.explode(
            F.concat(
                F.col("w"),
                F.expr(
                    "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
                    " (a, b) -> concat(a, ' ', b))"
                ),
            )
        ).alias("g"),
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("g"))), 1, 8), 16, 10
        ).cast("long"),
        F.lit(B),
    )
    postings = grams.select("id", "tgt", bucket.alias("b"))
    bucket_counts = postings.groupBy("b").agg(
        F.sum("tgt").alias("ct"),
        (F.count(F.lit(1)) - F.sum("tgt")).alias("cs"),
    )
    tot = bucket_counts.agg(
        F.sum("ct").alias("tt"), F.sum("cs").alias("ts")
    )
    ratio = bucket_counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log(
                    (F.col("ct") + 1).cast("double")
                    / (F.col("tt") + B).cast("double")
                )
                - F.log(
                    (F.col("cs") + 1).cast("double")
                    / (F.col("ts") + B).cast("double")
                )
            )
            * 1e6
        )
        .cast("long")
        .alias("ratio_micro"),
    )
    per_doc_bucket = postings.groupBy("id", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_doc_bucket.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("ratio_micro")).cast("long").alias("logw_micro"),
        )
        .select(F.col("id").alias(id_col), "n_grams", "logw_micro")
    )


# Compact demo polarity lexicon (AFINN-style integer valences, the
# lexicon-based scoring family of the EDBT'16 Spark sentiment paper) —
# injectable: production passes its own (word -> integer) mapping.
SENTIMENT_LEXICON: dict[str, int] = {
    "good": 2, "great": 3, "excellent": 4, "amazing": 4, "love": 3,
    "like": 1, "best": 3, "happy": 3, "nice": 2, "fast": 1,
    "perfect": 4, "wonderful": 4, "fantastic": 4, "awesome": 4,
    "improved": 2, "win": 2, "success": 2, "easy": 1, "useful": 2,
    "reliable": 2, "bad": -2, "terrible": -4, "awful": -4,
    "hate": -3, "worst": -4, "poor": -2, "slow": -1, "broken": -3,
    "fail": -2, "failure": -2, "bug": -2, "crash": -3, "error": -2,
    "sad": -2, "angry": -3, "disappointing": -3, "horrible": -4,
    "useless": -3, "wrong": -2, "problem": -2,
}


def lexicon_sentiment_scores(
    docs: DataFrame,
    lexicon: dict[str, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lexicon-based sentiment scoring (the AFINN/opinion-lexicon
    family; the EDBT'16 large-scale-Spark-sentiment recipe): per
    document, the exact integer sum of matched token valences, the
    match count, and the sign label — the cheap, training-free
    sentiment signal corpus pipelines use for tone slicing and
    heuristic filtering.

    Determinism: valences are integers, the score an exact BIGINT sum;
    the label a CASE on its sign — nothing floats. Documents with NO
    lexicon hits score 0 with n_hits 0 (left join semantics), keeping
    the output one row per input document.

    Scale: tokens explode map-side and hash-join the BROADCAST lexicon
    (a literal-values frame — constant-bounded by definition); one
    per-doc partial-aggregable sum. No UDF, no vocabulary shuffle.
    """
    lex = SENTIMENT_LEXICON if lexicon is None else lexicon
    if not lex:
        raise ValueError("lexicon must be non-empty")
    spark = docs.sparkSession
    lex_df = spark.createDataFrame(
        sorted(lex.items()), "t string, valence int"
    )
    base = docs.select(F.col(id_col).alias("id"), T.tokens(F.col(text_col)).alias("w"))
    toks = base.select("id", F.explode("w").alias("t"))
    hits = toks.join(F.broadcast(lex_df), "t").groupBy("id").agg(
        F.sum("valence").cast("long").alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
    )
    ids = base.select("id")
    out = ids.join(hits, "id", "left").select(
        "id",
        F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
    )
    return out.select(
        F.col("id").alias(id_col),
        "score",
        "n_hits",
        F.when(F.col("score") > 0, F.lit("positive"))
        .when(F.col("score") < 0, F.lit("negative"))
        .otherwise(F.lit("neutral"))
        .alias("label"),
    )


def compression_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """zlib-compressibility quality signal — the Gopher/CCNet
    boilerplate detector ``doc_repetition_stats`` approximates with
    n-gram ratios, computed for real: highly compressible text IS
    repetitive text, so a low ``compression_ratio``
    (= deflate bytes / utf-8 bytes) flags template spam and a ratio
    near 1 flags high-entropy noise; quality corpora cluster in
    between. The standard pretraining filter signal.

    Arrow-batched ``mapInPandas`` (never per-row Python): each batch
    compresses with stdlib zlib at a FIXED level, so the scan is one
    narrow map-side pass with zero shuffle at any corpus size.
    Deterministic for a fixed zlib build (this container) and exactly
    replayable in-process — pytest recomputes ratios byte-for-byte —
    but not SQL-expressible, so the registered query is rows-only
    (the ANN/BPE gate class).
    """
    if not 1 <= level <= 9:
        raise ValueError(f"zlib level must be in [1, 9], got {level}")
    import pandas as pd  # noqa: F401  (worker-side import)

    schema = f"{id_col} long, n_bytes long, n_deflate long, compression_ratio double"

    def kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda t: t.encode("utf-8"))
            n_raw = raw.map(len)
            n_z = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_raw,
                    "n_deflate": n_z,
                    "compression_ratio": [
                        round(z / r, 6) if r > 0 else None
                        for z, r in zip(n_z, n_raw)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(kernel, schema)
