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


def test_every_family_has_driver_visible_evidence():
    """Round-4 policy (VERDICT r3 ask #2): the window keeps the 25 bench
    anchors and ROTATES the other 25 slots to queries that never had a
    driver CORRECTNESS row. A family rotated out of the window must
    therefore already be witnessed by a committed CORRECTNESS_r{N}.json —
    evidence is cumulative, the window is not required to re-span every
    family every round."""
    import glob
    import json
    import os

    qs = all_queries()
    window = list(qs)[:50]
    covered = {t for n in window for t in qs[n].tags}

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    witnessed: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                ok = row.get("hash_match") or (
                    row.get("rows_match") and row.get("err") is None
                )
                if name in qs and ok:
                    witnessed.add(name)
    covered |= {t for n in witnessed for t in qs[n].tags}

    missing = [f for f in REQUIRED_FAMILIES if f not in covered]
    assert not missing, f"families with no driver-visible evidence: {missing}"


def _witness_rounds(qs) -> "tuple[dict[str, int], int]":
    """Last green driver-witness round per query (full hash witness for
    oracled queries; a rows-only row with spark_rows recorded for
    oracle-less ones) plus the newest committed artifact's round number
    — shared by the never-witnessed and staleness guards, mirrored by
    tools/witness_ledger.py."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    newest = 0
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        newest = max(newest, rnd)
        with open(path) as f:
            for name, row in json.load(f).items():
                if name not in qs:
                    continue
                full = row.get("hash_match") and row.get("rows_match")
                rows_only = (
                    qs[name].oracle is None
                    and row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                if full or rows_only:
                    last[name] = max(last.get(name, 0), rnd)
    return last, newest


def test_never_witnessed_queries_are_in_the_driver_window():
    """Mechanical window guard (VERDICT r10 "what's wrong" #1): round 10
    shipped two queries that fell outside the driver's 50-query window
    and therefore had NO driver witness in any round — the family-tag
    test above couldn't catch it because the family was already covered.
    This guard closes that hole: every registry query that has never
    produced a driver row in any committed CORRECTNESS_r{N}.json (full
    hash witness for oracled queries; a rows-only row with spark_rows
    recorded counts for oracle-less queries) MUST sit in the first 50 of
    ``queries()`` so the NEXT driver run witnesses it. Would have failed
    on the round-10 repo state."""
    qs = all_queries()
    window = set(list(qs)[:50])
    witnessed, _ = _witness_rounds(qs)

    orphans = [n for n in qs if n not in witnessed and n not in window]
    assert not orphans, (
        f"queries with no driver witness in any committed CORRECTNESS "
        f"artifact AND outside the 50-query window (add them to "
        f"_CURATED_FIRST): {orphans}"
    )


def test_window_is_exactly_50_unique_queries():
    qs = all_queries()
    window = list(qs)[:50]
    assert len(window) == len(set(window)) == 50


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


def test_rotation_reserved_block_in_window():
    """ADVICE r11: round-11's planned rotation slots were displaced by
    new additions, starving the stalest witnesses another round. The
    registry now reserves explicit rotation slots (_ROTATION_RESERVED)
    that additions may NOT displace: every reserved name must sit inside
    the driver's 50-query window, and the block must keep at least 3
    slots so each round refreshes witnesses even at maximum addition
    pressure."""
    from appengine_mapreduce_spark.plans.registry import _ROTATION_RESERVED

    qs = all_queries()
    window = set(list(qs)[:50])
    assert len(_ROTATION_RESERVED) >= 3
    displaced = [n for n in _ROTATION_RESERVED if n not in window]
    assert not displaced, (
        f"reserved rotation slots displaced from the driver window "
        f"(shrink the additions list, not the reserved block): {displaced}"
    )


def test_fingerprint_sees_dict_and_list_closure_params():
    """ADVICE r12: a factory parameterized by a dict or list recipe (the
    epoch_repeat pattern) has byte-identical getsource across
    parameterizations — the fingerprint must still distinguish them, or
    editing a recipe would leave every sweep artifact mechanically
    'fresh'. Scalars were covered in round 12; this pins the container
    types, including nesting and dict key order irrelevance."""
    from appengine_mapreduce_spark.plans.registry import (
        _canon_value,
        _fn_fingerprint_src,
    )

    def factory(recipe, weights):
        def q(spark, sf_dir):
            return recipe, weights
        return q

    a = _fn_fingerprint_src(factory({"fr": 25000, "zh": 5000}, [1, 2]))
    b = _fn_fingerprint_src(factory({"fr": 25000, "zh": 9999}, [1, 2]))
    c = _fn_fingerprint_src(factory({"fr": 25000, "zh": 5000}, [2, 1]))
    d = _fn_fingerprint_src(factory({"zh": 5000, "fr": 25000}, [1, 2]))
    assert a != b, "dict value edit must change the fingerprint payload"
    assert a != c, "list order is meaningful and must be captured"
    assert a == d, "dict insertion order is not meaningful"
    # nested containers canonicalize too
    assert _canon_value({"a": [1, {"b": 2}]}) != _canon_value({"a": [1, {"b": 3}]})
    # non-capturable values skip without error and without collision noise
    assert _canon_value(object()) is None
    # round-13 review hardening: containers INSIDE tuples/frozensets
    # canonicalize too (raw repr leaked dict insertion order and memory
    # addresses), and a container holding any un-canonicalizable element
    # is skipped whole rather than embedding an address
    assert _canon_value(({"a": 1, "b": 2},)) == _canon_value(({"b": 2, "a": 1},))
    assert _canon_value((object(),)) is None
    assert _canon_value([1, object()]) is None
    assert _canon_value({"k": object()}) is None
    # frozensets canonicalize in sorted order, not per-process hash order
    assert _canon_value(frozenset({"x", "y"})) == _canon_value(frozenset({"y", "x"}))
    # all-scalar tuples keep their repr (digest compatibility with the
    # round-12 fast path)
    assert _canon_value((1, "a", 2.5)) == repr((1, "a", 2.5))


def test_witness_staleness_bounded():
    """Rotation-debt ceiling (VERDICT r12 ask #7): the never-witnessed
    guard above only catches queries with NO driver row ever; nothing
    stopped a once-witnessed query from going stale indefinitely. This
    bounds the tail: every registry query must either sit in the
    CURRENT window (scheduled for the next driver run) or have a green
    driver row within MAX_STALENESS_ROUNDS of the newest committed
    artifact. The threshold passes at the round-13 state (worst
    non-window witness is r3 against the r12 artifact, gap 9) and
    FORCES each round's rotation to keep draining the oldest bucket —
    tighten it as the tail clears (target: ~5 once the r4/r5 buckets
    are gone)."""
    MAX_STALENESS_ROUNDS = 9

    qs = all_queries()
    window = set(list(qs)[:50])
    last, newest = _witness_rounds(qs)

    too_stale = sorted(
        (newest - rnd, name)
        for name, rnd in last.items()
        if name not in window and newest - rnd > MAX_STALENESS_ROUNDS
    )
    assert not too_stale, (
        f"queries last driver-witnessed more than {MAX_STALENESS_ROUNDS} "
        f"rounds before the newest artifact (r{newest}) and NOT scheduled "
        f"in the current window — rotate them into _CURATED_FIRST: "
        f"{too_stale}"
    )
