"""Column-expression helpers. All JVM-side built-ins — no Python UDFs."""

from appengine_mapreduce_spark.functions.text import (
    tokens,
    word_shingles,
    shingles_from_tokens,
    nonempty_tokens,
)
from appengine_mapreduce_spark.functions.hashing import (
    MINHASH_PRIME,
    hash_pair,
    stable_hash32,
    stable_hash64,
    murmur3_bucket,
)
from appengine_mapreduce_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "tokens",
    "word_shingles",
    "shingles_from_tokens",
    "nonempty_tokens",
    "MINHASH_PRIME",
    "hash_pair",
    "stable_hash32",
    "stable_hash64",
    "murmur3_bucket",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
