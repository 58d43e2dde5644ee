"""Similarity-search operator tests: exact top-k, IVF multi-probe recall
monotonicity, and sign-LSH probe behavior on the embeddings fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from appengine_mapreduce_spark.operators.similarity import (
    brute_force_topk,
    ivf_probe_topk,
    sign_lsh_topk,
)
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def query_vec(emb):
    # A mid-corpus vector: not a list representative (those are min-id per
    # label), so probe selection is a genuine nearest-representative search.
    row = emb.filter(F.col("vec_id") == 137).select("embedding").first()
    return [float(x) for x in row[0]]


def test_brute_force_topk_is_exact(emb, query_vec):
    got = brute_force_topk(emb, query_vec, k=5).collect()
    assert len(got) == 5
    # top hit is the query vector itself (cosine 1.0)
    assert got[0].vec_id == 137 and got[0].cosine == pytest.approx(1.0)
    # scores descend
    scores = [r.cosine for r in got]
    assert scores == sorted(scores, reverse=True)


def test_ivf_multiprobe_recall_monotone(emb, query_vec):
    """The whole point of multi-probe: recall vs exact brute force is
    non-decreasing in the number of probed lists, and probing every list
    degenerates to the exact answer."""
    k = 10
    truth = {r.vec_id for r in brute_force_topk(emb, query_vec, k=k).collect()}
    n_lists = emb.select("label").distinct().count()

    recalls = []
    for p in (1, 2, 4, n_lists):
        got = {r.vec_id for r in ivf_probe_topk(emb, query_vec, n_probes=p, k=k).collect()}
        recalls.append(len(got & truth) / k)
    assert recalls == sorted(recalls), recalls  # monotone non-decreasing
    assert recalls[-1] == 1.0, recalls  # p = n_lists ⇒ exact
    assert recalls[0] > 0.0, recalls  # nearest list is never empty of hits


def test_ivf_probe_reads_only_probed_lists(emb, query_vec):
    """Scale property: the probed scan must filter on the chosen list ids
    (partition-prunable on a bucketed corpus), not scan the corpus."""
    df = ivf_probe_topk(emb, query_vec, n_probes=2, k=10)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "label" in plan and ("IN" in plan or "isin" in plan.lower()), plan


def test_sign_lsh_topk_subset_of_bucket(emb, query_vec):
    got = sign_lsh_topk(emb, query_vec, k=10, num_bits=4).collect()
    # every hit shares the query's 4-bit sign bucket
    q_bucket = sum(1 << i for i in range(4) if query_vec[i] >= 0)
    ids = [r.vec_id for r in got]
    rows = emb.filter(F.col("vec_id").isin(ids)).select("vec_id", "embedding").collect()
    for r in rows:
        b = sum(1 << i for i in range(4) if float(r.embedding[i]) >= 0)
        assert b == q_bucket, (r.vec_id, b, q_bucket)


def test_batch_ann_topk_contract(emb):
    """Every query's neighbor list: self ranks first (cosine 1.0), all
    hits share the query's sign bucket, ≤ k rows per query."""
    from appengine_mapreduce_spark.operators.similarity import (
        sign_lsh_batch_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = sign_lsh_batch_topk(emb, queries, k=3, num_bits=6).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.select("vec_id", "embedding").collect()}

    def bucket(v):
        return sum(1 << i for i in range(6) if v[i] >= 0)

    for qid, hits in by_q.items():
        assert len(hits) <= 3
        best = max(hits, key=lambda r: (r.cosine, -r.vec_id))
        assert best.vec_id == qid and best.cosine == pytest.approx(1.0)
        for h in hits:
            assert bucket(vecs[h.vec_id]) == bucket(vecs[qid])


def test_sq8_recall_and_code_range(emb, query_vec):
    """SQ8 quantized top-k: codes stay in [0, 255], reconstruction error is
    bounded by half a quantization step per dimension, and recall@10 vs
    exact brute force is high (64-dim vectors lose little to 8-bit scalar
    quantization)."""
    from appengine_mapreduce_spark.operators.similarity import (
        sq8_adc_topk,
        sq8_encode,
        sq8_stats,
    )

    stats = sq8_stats(emb)
    srow = stats.collect()[0]
    encoded = sq8_encode(emb, stats)
    enc_rows = encoded.limit(50).collect()
    for r in enc_rows:
        assert all(0 <= c <= 255 for c in r.codes), r.codes
        # reconstruction is within one quantization step of the original
        orig = {
            v.vec_id: [float(x) for x in v.embedding]
            for v in emb.filter(F.col("vec_id") == r.vec_id).collect()
        }[r.vec_id]
        for d, c in enumerate(r.codes):
            rng = srow.mx_arr[d] - srow.mn_arr[d]
            recon = srow.mn_arr[d] + c * rng / 255.0
            assert abs(recon - orig[d]) <= rng / 255.0 + 1e-9

    truth = {r.vec_id for r in brute_force_topk(emb, query_vec, k=10).collect()}
    got = {r.vec_id for r in sq8_adc_topk(encoded, query_vec, k=10).collect()}
    recall = len(got & truth) / 10
    assert recall >= 0.7, (recall, got, truth)


def test_hard_negative_topk_excludes_positives_and_matches_bruteforce(emb):
    """Hard-negative mining contract: no positive (nor the query itself)
    ever appears in the output; ranks are 1..k per query by descending
    cosine; and within each query's sign bucket the chosen negatives ARE
    the brute-force top-k non-positives (the bucket join loses no
    candidate inside the bucket)."""
    from appengine_mapreduce_spark.operators.similarity import (
        hard_negative_topk,
        sign_bucket,
    )
    from appengine_mapreduce_spark.functions.vectors import cosine_similarity

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # positives: the query itself + every same-label vector
    positives = (
        emb.join(
            emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("_ql"),
            ),
            F.col("label") == F.col("_ql"),
        ).select("query_id", "vec_id")
    )
    pos_set = {(r.query_id, r.vec_id) for r in positives.collect()}
    rows = hard_negative_topk(emb, queries, positives, k=3, num_bits=6).collect()

    by_q: dict = {}
    for r in rows:
        assert (r.query_id, r.vec_id) not in pos_set, r
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for qid, hits in by_q.items():
        hits.sort(key=lambda r: r.rank)
        assert [h.rank for h in hits] == list(range(1, len(hits) + 1))
        scores = [h.cosine for h in hits]
        assert scores == sorted(scores, reverse=True)

    # brute-force within-bucket check for query 0
    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qv = F.array(*[F.lit(float(x)) for x in q0])
    b0 = emb.filter(F.col("vec_id") == 0).select(
        sign_bucket(F.col("embedding"), 6).alias("b")
    ).first().b
    in_bucket = emb.filter(sign_bucket(F.col("embedding"), 6) == b0).select(
        "vec_id", F.round(cosine_similarity(F.col("embedding"), qv), 6).alias("c")
    ).collect()
    cands = sorted(
        (r for r in in_bucket if (0, r.vec_id) not in pos_set),
        key=lambda r: (-r.c, r.vec_id),
    )[:3]
    expect = [(r.vec_id, r.c) for r in cands]
    got = [(h.vec_id, h.cosine) for h in sorted(by_q.get(0, []), key=lambda r: r.rank)]
    assert got == expect, (got, expect)
