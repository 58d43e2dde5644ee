"""Stable, engine-portable hashing expressions.

The reference shuffles on ``hash(key) % shards`` (python shuffler.py:528)
and murmur3-range-division (java impl/HashingSharder.java:33-39). For
*partitioning* we use Spark's own murmur3 (``F.hash``) — assignment
stability within Spark is what matters at scale, not cross-engine equality.

For *content hashing that must be reproducible across engines* (dedup
fingerprints, MinHash — verified against the DuckDB oracle) we derive
integers from md5 hex, which every engine computes identically.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def stable_hash32(col: Column, salt: str | None = None) -> Column:
    """Deterministic 32-bit non-negative hash, identical in any engine
    with md5: ``int(md5(salt || ':' || x)[:8], 16)``."""
    inp = F.concat(F.lit(f"{salt}:"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(inp), 1, 8), 16, 10).cast("bigint")


def stable_hash64(col: Column, salt: str | None = None) -> Column:
    """Deterministic 60-bit non-negative hash from md5 hex (15 nibbles —
    stays clear of BIGINT sign issues in any engine)."""
    inp = F.concat(F.lit(f"{salt}:"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(inp), 1, 15), 16, 10).cast("bigint")


# Prime > 2^32 for Carter-Wegman hash families (a + i·b stays < 2^36,
# far inside BIGINT — exact in any engine).
MINHASH_PRIME = 4294967311


def hash_pair(col: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hashes from ONE md5 (hex nibbles 1-8 and
    9-16) — the seed pair for a Carter-Wegman hash family
    ``h_i(x) = (a + i·b) mod p``. One digest per value instead of one
    per (value × hash function)."""
    hx = F.md5(col)
    a = F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint")
    b = F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint")
    return a, b


def murmur3_bucket(col: Column, num_buckets: int) -> Column:
    """Spark-native stable bucket assignment: ``pmod(murmur3(x), n)``.

    Parity with the reference's HashingSharder intent (stable shard
    routing, java impl/HashingSharder.java:16-40); the exact murmur3
    variant differs but the contract — uniform, deterministic, stable
    under re-hash — is the same.
    """
    return F.pmod(F.hash(col), F.lit(num_buckets))
