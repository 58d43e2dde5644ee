"""Training-corpus pipeline queries: repetition filters and PII scrubbing.

These extend the LLM-data-pipeline operator family (SURVEY.md's
beyond-reference mandate) with the two scrub passes every corpus build
runs before training: repetition-based quality filtering (Gopher-style
signals) and PII detection/redaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


@register(
    "repetition_signals",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
        tok_rows AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
        tc AS (SELECT doc_id, tok, count(*) AS n FROM tok_rows
               GROUP BY doc_id, tok),
        ts AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS total,
                      count(*) AS dist, max(n) AS top
               FROM tc GROUP BY doc_id),
        bg_rows AS (
            SELECT doc_id, unnest(
                CASE WHEN len(tk) >= 2
                     THEN list_transform(generate_series(1, len(tk) - 1),
                                         i -> array_to_string(tk[i:i+1], ' '))
                     ELSE [] END) AS bg
            FROM toks),
        bc AS (SELECT doc_id, bg, count(*) AS n FROM bg_rows
               GROUP BY doc_id, bg),
        bt AS (SELECT doc_id, max(n) AS top_bg FROM bc GROUP BY doc_id)
        SELECT ts.doc_id,
               1.0 - dist / total AS dup_tok_fraction,
               top / total AS top_tok_fraction,
               COALESCE(top_bg, 0) * 2 / total AS top_bigram_fraction
        FROM ts LEFT JOIN bt ON ts.doc_id = bt.doc_id
    """,
    description="Gopher-style repetition filters per document: duplicate-"
    "token fraction, most-frequent-token fraction, most-frequent-bigram "
    "coverage — the standard pre-training quality cut for looping/spam "
    "text. Explode + groupBy (O(tokens), one doc-keyed shuffle), never "
    "quadratic per-row array ops.",
    bench=True,
    tags=("pipeline", "text", "quality"),
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.text_analysis import repetition_signals

    return repetition_signals(load(spark, sf_dir, "documents"))


# PII gate query: the raw corpus is synthetic word soup with no PII, so the
# query PLANTS deterministic PII derived from table columns (same formula
# in the oracle) and then proves the scanner finds and redacts exactly it.
_AUGMENT_SQL = """
    CASE WHEN doc_id % 3 = 0
         THEN text || ' contact user' || doc_id ||
              '@example.com or https://site' || doc_id ||
              '.example/x ip 10.0.' || (doc_id % 256) || '.7 tel +1555' ||
              (1000000 + doc_id)
         ELSE text END
"""


@register(
    "pii_scan_redact",
    oracle=f"""
        WITH aug AS (SELECT doc_id, {_AUGMENT_SQL} AS text FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
                    AS INT) AS n_email,
               CAST(len(regexp_extract_all(text, 'https?://[^\\s]+'))
                    AS INT) AS n_url,
               CAST(len(regexp_extract_all(text,
                    '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}'))
                    AS INT) AS n_ipv4,
               CAST(len(regexp_extract_all(text, '\\+[0-9]{{7,15}}'))
                    AS INT) AS n_intl_phone,
               substr(regexp_replace(regexp_replace(regexp_replace(
                          regexp_replace(text,
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                          '[EMAIL]', 'g'),
                          'https?://[^\\s]+', '[URL]', 'g'),
                          '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}',
                          '[IPV4]', 'g'),
                          '\\+[0-9]{{7,15}}', '[INTL_PHONE]', 'g'),
                      1, 120) AS redacted_head
        FROM aug
    """,
    description="PII scan + redaction: plant deterministic emails/URLs/IPs/"
    "phone numbers in a third of the docs (same formula both sides), then "
    "count every PII class via regexp_extract_all and redact via chained "
    "regexp_replace — the corpus scrub pass, all whole-stage-codegen "
    "expressions, patterns chosen to parse identically under Java regex "
    "and RE2.",
    tags=("pipeline", "text", "pii"),
)
def pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.text_analysis import pii_scan

    docs = load(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id").cast("string"),
                F.lit("@example.com or https://site"),
                F.col("doc_id").cast("string"),
                F.lit(".example/x ip 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 tel +1555"),
                (F.col("doc_id") + 1000000).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    scanned = pii_scan(aug, redact=True)
    return scanned.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_url").cast("int").alias("n_url"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.col("n_intl_phone").cast("int").alias("n_intl_phone"),
        F.substring("redacted_text", 1, 120).alias("redacted_head"),
    )
