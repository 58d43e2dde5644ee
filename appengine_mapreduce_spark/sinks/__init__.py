"""Output sinks — the reference's OutputWriter zoo as DataFrame writers.

Exactly-once commit (the reference's tmp-file rewrite + GC protocol,
output_writers.py:863-1054) is owned by Spark's file commit protocol;
what remains here is the user-facing surface: per-shard files, size
segmentation, key sharding, in-memory collect, batched mutation pools,
and schema-derived JSON staging.
"""
