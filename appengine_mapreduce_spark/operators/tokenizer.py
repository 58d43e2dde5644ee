"""Distributed BPE tokenizer training (Sennrich et al. 2016 greedy merges).

The scale shape that makes BPE trainable on a 100 TB corpus: the corpus
collapses to a WORD-FREQUENCY table first (one shuffle — vocabulary-sized,
millions of rows, not billions), and every merge round then runs on that
small table: count adjacent symbol pairs weighted by word frequency, pick
the global best (a scalar — the model parameter, like a k-means centroid
collect), and apply the merge with a JVM-side array fold. N merges cost N
small jobs over the vocab table; the corpus is read exactly once.

Tie-breaking is deterministic (max count, then lexicographic pair), so
training is reproducible across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over whitespace tokens — the corpus-sized step."""
    from appengine_mapreduce_spark.core.partitioning import ensure_parallelism

    toks = ensure_parallelism(docs.select(text_col)).select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
        ).alias("word")
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def _adjacent_pairs(sym: Column) -> Column:
    n = F.size(sym)
    return F.arrays_zip(
        F.slice(sym, 1, n - 1).alias("left"),
        F.slice(sym, 2, n - 1).alias("right"),
    )


def _apply_merge(sym: Column, left: str, right: str) -> Column:
    """Merge every adjacent (left, right) into one symbol via an array
    fold — greedy left-to-right, matching reference BPE semantics. Pure
    JVM expressions (F.aggregate over the symbol array)."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        can_merge = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right))
            # a just-merged symbol must not merge again with a following
            # `right` unless it literally equals `left`
        )
        return F.when(
            can_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        sym, F.array().cast("array<string>"), step
    )


def bpe_apply_merges(
    words: DataFrame,
    merges: "list[tuple[str, str, int]]",
    sym_col: str = "sym",
) -> DataFrame:
    """Apply a learned merge list IN TRAINING ORDER to a symbolized
    vocab table — the tokenizer ENCODE step, separated from training so
    a frozen tokenizer model (the N-merge list, driver-sized) can
    segment any corpus. Each merge is the same greedy left-to-right JVM
    array fold training uses; N merges stack as N expression layers in
    ONE plan over the vocabulary-sized table — no shuffle, no Python.
    At 100 TB the corpus collapses to (word, count) first, so encode
    cost is vocab-sized regardless of corpus size."""
    out = words
    for left, right, _n in merges:
        out = out.withColumn(
            sym_col, _apply_merge(F.col(sym_col), left, right)
        )
    return out


def bpe_token_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    top_k: int = 50,
) -> DataFrame:
    """Train BPE and report the top-k POST-MERGE token frequencies —
    the vocabulary a data pipeline ships to its tokenizer, and the
    per-token corpus statistics that drive vocab-size decisions.
    Training (iterative, driver model) + encode (expression stack) +
    one vocabulary-sized aggregation; tie-break (freq desc, token) is
    total, so the top-k is deterministic and oracle-replayable."""
    merges = train_bpe_merges(docs, text_col=text_col, n_merges=n_merges)
    words = word_frequencies(docs, text_col).withColumn(
        "sym", F.split(F.col("word"), "")
    )
    encoded = bpe_apply_merges(words, merges)
    return (
        encoded.select("count", F.explode("sym").alias("token"))
        .groupBy("token")
        .agg(F.sum("count").alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(top_k)
    )


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn the top ``n_merges`` BPE merges; returns
    [(left, right, weighted_count), ...] in training order.

    Each round = one aggregation over the cached vocab table + one scalar
    collect (the chosen merge — the model parameter) + one expression-only
    column rewrite. Stops early when no pair reaches ``min_pair_count``.
    """
    words = word_frequencies(docs, text_col).withColumn(
        "sym", F.split(F.col("word"), "")
    )
    words = words.select("count", "sym").cache()
    words.count()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            pairs = words.select(
                "count", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
            )
            best = (
                pairs.groupBy(
                    F.col("p.left").alias("l"), F.col("p.right").alias("r")
                )
                .agg(F.sum("count").alias("n"))
                .orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
                .first()
            )
            if best is None or best["n"] < min_pair_count:
                break
            merges.append((best["l"], best["r"], int(best["n"])))
            nxt = words.select(
                "count", _apply_merge(F.col("sym"), best["l"], best["r"]).alias("sym")
            ).cache()
            nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return merges
