"""Text analysis, round 3: BPE-style token accounting and winnowing
(rolling-hash) document fingerprints — the two remaining brief items in
the text family ("token counting (whitespace + a BPE-ish regex)",
"document fingerprinting (rolling hash)")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

# Keep in sync with functions/text.BPE_PRETOKEN_PATTERN (RE2-compatible so
# DuckDB replays it identically).
_BPE_PAT = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


@register(
    "bpe_token_stats",
    oracle=f"""
        WITH t AS (
            SELECT regexp_extract_all(text, '{_BPE_PAT}') AS toks
            FROM documents
        ),
        tot AS (
            SELECT CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
                   round(avg(len(toks)), 6) AS mean_tokens_per_doc
            FROM t
        ),
        dis AS (
            SELECT count(DISTINCT tok) AS distinct_tokens
            FROM (SELECT unnest(toks) AS tok FROM t)
        )
        SELECT total_tokens, distinct_tokens, mean_tokens_per_doc
        FROM tot, dis
    """,
    description="Corpus token accounting under a BPE-style pre-tokenizer "
    "(letter/digit/punctuation runs with leading space, the GPT-2-family "
    "segmentation restricted to RE2-safe constructs) — the 'tokens the "
    "model will see' budget next to the whitespace count "
    "(functions/text.bpe_style_tokens; regexp_extract_all stays in "
    "whole-stage codegen). Same one-pass totals + distinct shape as "
    "token_stats_corpus.",
    tags=("text", "tokenizer", "counters", "scalar-cross"),
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.functions.text import bpe_style_tokens
    from appengine_mapreduce_spark.operators.text_analysis import token_stats

    docs = load(spark, sf_dir, "documents")
    return token_stats(docs, tokenizer=bpe_style_tokens)


@register(
    "winnow_doc_fingerprints",
    oracle="""
        WITH h AS (
            SELECT doc_id,
                   list_transform(generate_series(1, len(text) - 7),
                       i -> ('0x' || substr(md5('win:' || substr(text, i, 8)),
                                            1, 8))::BIGINT) AS hs
            FROM documents WHERE doc_id < 500
        ),
        fp AS (
            SELECT doc_id,
                   list_distinct(list_transform(generate_series(1, len(hs) - 3),
                       j -> list_min(hs[j:j+3]))) AS fps
            FROM h
        )
        SELECT doc_id,
               CAST(len(fps) AS INT) AS n_fingerprints,
               CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS fp_checksum
        FROM fp
    """,
    description="Winnowing fingerprints (Schleimer et al. SIGMOD'03, the "
    "MOSS scheme): rolling hash over character 8-grams, minimum per "
    "4-window, distinct minima = the fingerprint set overlapping documents "
    "share even after edits shift offsets — the rolling-hash fingerprint "
    "channel next to the position-weighted doc_fingerprints. Pure array "
    "expressions, O(len·k) per doc, hash array materialized once "
    "(operators/text_analysis.winnow_fingerprints); DuckDB replays the "
    "md5 arithmetic for exact parity.",
    tags=("text", "fingerprint", "dedup"),
)
def winnow_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return winnow_fingerprints(docs, k=8, window=4)


@register(
    "bpe_learned_merges",
    oracle=None,  # iterative greedy training (like kmeans) — rows-only
    # driver check; exact-merge verification lives in
    # tests/test_operators.py (classic worked example + determinism)
    description="Distributed BPE tokenizer TRAINING "
    "(operators/tokenizer.train_bpe_merges): the corpus collapses to a "
    "vocabulary-sized word-frequency table once, then each greedy merge "
    "round is a pair-count aggregation + scalar best-pair collect (the "
    "model parameter) + a JVM array-fold rewrite — N merges never re-read "
    "the corpus. Deterministic tie-breaking makes training reproducible; "
    "the classic {hug,pug,pun,bun,hugs} example is verified merge-by-"
    "merge in pytest.",
    tags=("text", "tokenizer", "training-data", "iterative"),
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.tokenizer import (
        train_bpe_merges,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    merges = train_bpe_merges(docs, n_merges=6)
    return spark.createDataFrame(
        [(i, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "rank int, left string, right string, pair_count bigint",
    )


@register(
    "document_chunks",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '') AS t
            FROM documents WHERE doc_id < 400
        ),
        starts AS (
            SELECT doc_id, t,
                   unnest(generate_series(
                       0, CAST(len(t) - 1 AS INT), 48)) AS s
            FROM toks WHERE len(t) > 0
        )
        SELECT doc_id,
               -- filter mirrors the operator: suppress pure-overlap tails
               CAST(s // 48 AS INT) AS chunk_id,
               CAST(s AS INT) AS start_token,
               CAST(len(t[s + 1 : s + 64]) AS INT) AS n_tokens,
               array_to_string(t[s + 1 : s + 64], ' ') AS chunk_text
        FROM starts
        WHERE s = 0 OR s + 16 < len(t)
    """,
    description="Sliding-window document chunking "
    "(operators/text_analysis.chunk_documents): 64-token windows, "
    "16-token overlap, with provenance (chunk ordinal, token offset, "
    "true final-window length) — the RAG-indexing / training-prep "
    "fan-out. Narrow plan: split/sequence/explode/slice/array_join in "
    "one codegen span, zero shuffles, zero UDFs. The oracle replays the "
    "same windows with DuckDB list slicing.",
    tags=("text", "training-data", "chunking"),
)
def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.text_analysis import (
        chunk_documents,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return chunk_documents(docs, chunk_tokens=64, overlap=16)
