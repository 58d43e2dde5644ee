"""Text tokenization / shingling expressions.

Replaces the reference's user-code string mappers
(reference: python/demo/main.py:181-192 split_into_sentences/words) with
JVM-side column expressions that stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column | str, pattern: str = r"\s+") -> Column:
    """Split ``text`` into tokens on a regex (default: whitespace runs)."""
    return F.split(F.col(text) if isinstance(text, str) else text, pattern)


def nonempty_tokens(text: Column | str, pattern: str = r"\s+") -> Column:
    """Tokens with empty strings removed (split artifacts at string edges)."""
    return F.filter(tokens(text, pattern), lambda t: t != F.lit(""))


# BPE-style pre-tokenizer pattern (the GPT-2 family shape, restricted to
# constructs RE2 also supports — no lookahead — so the DuckDB oracle can
# replay it): a token is an optional leading space + a letter run, digit
# run, or punctuation run. Whitespace itself is not a token.
BPE_PRETOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_style_tokens(text: Column | str) -> Column:
    """BPE-ish sub-word pre-tokenization as a JVM expression: the
    letter/digit/punctuation-run segmentation every byte-pair tokenizer
    applies before merges. Counting these is the standard proxy for
    "tokens the model will see" when budgeting a corpus (the merge step
    itself needs a vocabulary, which is model-specific)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column. Keep tokenization in its own projection: passing the
    raw ``split(...)`` expression here would re-tokenize the document at
    every window position (Catalyst does not CSE inside a Generate),
    turning a linear scan quadratic.
    """
    count = F.size(toks) - F.lit(n - 1)
    starts = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` (for Jaccard / MinHash).

    Convenience single-expression form; prefer projecting
    ``nonempty_tokens`` first and calling ``shingles_from_tokens`` in a
    second projection (see that function's note on quadratic re-splitting).
    Documents shorter than ``n`` tokens yield an empty array.
    """
    return shingles_from_tokens(nonempty_tokens(text), n)
