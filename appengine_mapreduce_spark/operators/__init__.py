"""Reusable DataFrame operators.

``shuffle``       — the reference's shuffle/reducer semantics as DataFrame
                    ops (group-by-key collation, distinct, chunked collect).
``dedup``         — exact + near-duplicate detection (md5, MinHash+LSH,
                    SimHash, n-gram Jaccard) for training-data pipelines.
``similarity``    — embedding similarity search (brute-force cosine top-k,
                    sign-LSH bucketed ANN).
``text_analysis`` — language-ID, quality scoring, token stats, fingerprints.
``multimodal``    — opaque-binary column plumbing (decode stubs, real
                    Spark-side schema/batching).
"""
