"""Registry contract tests: the driver checks only the FIRST 50 queries
in ``queries()`` order, so the curated prefix must keep spanning every
operator family, and every oracle must stay well-formed."""

from __future__ import annotations

from appengine_mapreduce_spark.plans import all_queries

# tag → must appear in the driver's 50-query window
REQUIRED_FAMILIES = [
    "mr-parity", "api", "source", "sources", "zip", "records", "csv",
    "json", "merge", "scd2", "analytics", "tpch", "asof", "window",
    "sessionization", "text", "tfidf", "pipeline", "pii", "similarity",
    "ann", "ivf", "dedup", "minhash", "jaccard", "graph", "timeseries",
    "multimodal", "png", "jpeg", "dynamic-schema", "sampling", "sql",
]


def test_first_50_queries_cover_every_family():
    qs = all_queries()
    window_tags = {t for n in list(qs)[:50] for t in qs[n].tags}
    missing = [f for f in REQUIRED_FAMILIES if f not in window_tags]
    assert not missing, f"families missing from the driver window: {missing}"


def test_registry_names_unique_and_callable():
    qs = all_queries()
    assert len(qs) == len(set(qs))
    for name, spec in qs.items():
        assert callable(spec.fn), name
        assert spec.description, name


def test_oracled_queries_have_nonempty_sql():
    qs = all_queries()
    oracled = [s for s in qs.values() if s.oracle is not None]
    # the overwhelming majority must be oracle-checked (rows-only is the
    # documented exception for iterative / RNG / stub operators)
    rows_only = [s.name for s in qs.values() if s.oracle is None]
    assert len(rows_only) <= 6, rows_only
    for s in oracled:
        assert "SELECT" in s.oracle.upper(), s.name
