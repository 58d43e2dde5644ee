"""Text-analysis queries over ``documents`` — language-ID, quality scoring,
token accounting, fingerprints. The oracles replay the identical arithmetic
in DuckDB (same tokenization, same md5-derived hashes, same fold order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.operators import text_analysis
from appengine_mapreduce_spark.operators.text_analysis import LANG_MARKERS, STOPWORDS
from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


def _list_lit(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_LANGS = sorted(LANG_MARKERS)
_HITS_COLS = ",\n               ".join(
    f"len(list_filter(tk, t -> list_contains({_list_lit(LANG_MARKERS[lg])}, t))) AS hits_{lg}"
    for lg in _LANGS
)
_BEST = "greatest(" + ", ".join(f"hits_{lg}" for lg in _LANGS) + ")"
_PRED_CASE = (
    "CASE "
    + " ".join(
        f"WHEN hits_{lg} = {_BEST} AND {_BEST} > 0 THEN '{lg}'" for lg in _LANGS
    )
    + " ELSE 'und' END"
)


@register(
    "lang_id_pred",
    oracle=f"""
        SELECT doc_id, {_PRED_CASE} AS pred_lang
        FROM (SELECT doc_id, {_HITS_COLS}
              FROM (SELECT doc_id, {_TOKS} AS tk FROM documents))
    """,
    description="Heuristic language-ID: argmax of marker-word hits per "
    "language, deterministic tie-break — pure codegen expressions, zero "
    "Python in the scan.",
    tags=("text", "lang-id"),
)
def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.language_id(load(spark, sf_dir, "documents"))


@register(
    "quality_scores",
    oracle=f"""
        SELECT doc_id, n_tokens, mean_tok_len, stop_ratio, alnum_ratio,
               (least(1.0, n_tokens / 100.0) * 0.4 + stop_ratio * 0.3)
                     + alnum_ratio * 0.3 AS quality
        FROM (
            SELECT doc_id,
                   len(tk) AS n_tokens,
                   CASE WHEN len(tk) > 0
                        THEN list_sum(list_transform(tk, t -> length(t)))
                                   / len(tk)
                        ELSE 0.0 END AS mean_tok_len,
                   CASE WHEN len(tk) > 0
                        THEN len(list_filter(tk,
                                 t -> list_contains({_list_lit(STOPWORDS)}, t)))
                                   / len(tk)
                        ELSE 0.0 END AS stop_ratio,
                   CASE WHEN length(text) > 0
                        THEN length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
                                   / length(text)
                        ELSE 0.0 END AS alnum_ratio
            FROM (SELECT doc_id, text, {_TOKS} AS tk FROM documents)
        )
    """,
    description="Per-document quality features (token count, mean token "
    "length, stopword ratio, alphanumeric ratio) + combined score — standard "
    "corpus-filtering heuristics as one codegen'd projection.",
    bench=True,
    tags=("text", "quality"),
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.quality_score(load(spark, sf_dir, "documents"))


@register(
    "token_stats_corpus",
    oracle=f"""
        SELECT (SELECT CAST(sum(len(tk)) AS BIGINT)
                FROM (SELECT {_TOKS} AS tk FROM documents)) AS total_tokens,
               (SELECT count(DISTINCT tok)
                FROM (SELECT unnest({_TOKS}) AS tok FROM documents)) AS distinct_tokens,
               (SELECT round(avg(len(tk)), 6)
                FROM (SELECT {_TOKS} AS tk FROM documents)) AS mean_tokens_per_doc
    """,
    description="Corpus token accounting (counters-style single row): total "
    "tokens, vocabulary size, mean tokens/doc.",
    tags=("text", "counters", "scalar-cross"),
)
def token_stats_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.token_stats(load(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN len(tk) = 0 THEN 0::BIGINT
                    ELSE list_sum(list_transform(
                             generate_series(1, len(tk)),
                             i -> ('0x' || substr(md5('fp:' || tk[i]), 1, 8))::BIGINT
                                  * i::BIGINT))::BIGINT
               END AS fingerprint
        FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
    """,
    description="Order-sensitive document fingerprint: position-weighted sum "
    "of stable token hashes (rolling-hash analog, exact bigint arithmetic — "
    "engine-portable).",
    tags=("text", "fingerprint"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.fingerprint(load(spark, sf_dir, "documents"))


@register(
    "top_tokens",
    oracle=f"""
        SELECT tok, count(*) AS n
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
    """,
    description="Top-20 tokens by frequency — wordcount + deterministic "
    "top-k (partial top-k per partition via TakeOrderedAndProject).",
    tags=("text", "topk"),
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("tok")
    )
    return (
        words.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
    )
