"""Unit tests for tools/sf2_sweep.py's artifact-merge arithmetic — the
exponent recomputation that --redo relies on (a wrong merge silently
corrupts the standing scaling evidence). Spark-free: only the pure
helpers are imported."""

from __future__ import annotations

import importlib.util
import os
import sys

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "sf2_sweep", os.path.join(_TOOLS, "sf2_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sf2_sweep"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_noop_merge_includes_limit_twins_and_recomputes_worst():
    m = _load_sweep()
    out = {
        "sf1_noop_queries": {"a": 1.0, "q3_top_orders": 2.0},
        "sf2_noop_queries": {"a": 2.0, "q3_top_orders": 2.0},
    }
    m._noop_merge(out)
    assert out["noop_exponent_sf1_to_sf2_log2"] == {
        "a": 1.0, "q3_top_orders": 0.0}
    assert out["worst_noop_exponent"] == 1.0
    # one-sided entries (an anchor measured at sf1 only) are skipped,
    # not KeyError'd
    out["sf1_noop_queries"]["only_sf1"] = 3.0
    m._noop_merge(out)
    assert "only_sf1" not in out["noop_exponent_sf1_to_sf2_log2"]


def test_sf4_merge_third_doubling_exponents():
    m = _load_sweep()
    out = {
        "sf2_noop_queries": {"a": 2.0, "q5_region_revenue": 1.0},
        "sf4_noop_queries": {"a": 4.0, "q5_region_revenue": 1.0},
        "capstones": {
            "corpus_build_pipeline": {"sf2_sec": 10.0, "sf4_sec": 20.0},
            "no_sf4_yet": {"sf2_sec": 5.0},
        },
    }
    m._sf4_merge(out)
    assert out["noop_exponent_sf2_to_sf4_log2"] == {
        "a": 1.0, "q5_region_revenue": 0.0}
    assert out["worst_noop_exponent_sf2_to_sf4"] == 1.0
    caps = out["capstones"]
    assert caps["corpus_build_pipeline"][
        "scaling_exponent_sf2_to_sf4_log2"] == 1.0
    # a capstone without an sf4 measurement is left untouched
    assert "scaling_exponent_sf2_to_sf4_log2" not in caps["no_sf4_yet"]


def test_limit_noop_queries_are_bench_anchors():
    """The twins must name real bench queries (the child code indexes
    bench_queries()), and q3 must be the only one needing the
    count-wrap (the wrap hardcodes its revenue column)."""
    m = _load_sweep()
    from appengine_mapreduce_spark.plans import bench_queries

    specs = bench_queries()
    for n in m._LIMIT_NOOP_QUERIES:
        assert n in specs, n
    assert "q3_top_orders" in m._LIMIT_NOOP_QUERIES


def test_child_rejects_explicit_empty_query_list():
    """`queries or _NOOP_QUERIES` silently ran the full 12-query suite
    when a redo computed an empty anchor set (round-13 review); an
    explicit empty tuple must be an error, None must mean default."""
    import pytest

    m = _load_sweep()
    with pytest.raises(SystemExit, match="empty query list"):
        m._child(m._NOOP_CODE, "/nonexistent", "noop-test", queries=())
