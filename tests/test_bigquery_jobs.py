"""BigQuery load-job lifecycle tests (bundle/submit/poll/retry/cleanup)
against a scripted fake service — mirrors the reference's
bigqueryjobs/* pipeline semantics."""

from __future__ import annotations

from appengine_mapreduce_spark.sinks.bigquery_jobs import (
    LoadJobResult,
    bundle_files,
    load_files_to_bigquery,
)


class FakeService:
    """Scriptable LoadJobService: per-job state sequences, per-submission
    fatal errors, transient poll failures."""

    def __init__(self, sizes=None, state_script=None, fatal_on_submission=(),
                 poll_raises_first_n=0, non_fatal=None):
        self.sizes = sizes or {}
        self.state_script = state_script or ["PENDING", "RUNNING", "DONE"]
        self.fatal_on_submission = set(fatal_on_submission)  # 1-based indices
        self.poll_raises_first_n = poll_raises_first_n
        self.non_fatal = non_fatal
        self.submissions: list[list[str]] = []
        self.deleted: list[list[str]] = []
        self._job_states: dict[str, list[str]] = {}
        self._polls = 0

    def file_size(self, path):
        return self.sizes.get(path, 1)

    def insert_load_job(self, dataset, table, files, schema):
        assert dataset and table and schema is not None
        self.submissions.append(list(files))
        job_id = f"job-{len(self.submissions)}"
        if len(self.submissions) in self.fatal_on_submission:
            self._job_states[job_id] = ["PENDING", "FATAL"]
        else:
            self._job_states[job_id] = list(self.state_script)
        return job_id

    def get_job(self, job_id):
        self._polls += 1
        if self._polls <= self.poll_raises_first_n:
            raise IOError("transient poll failure")
        states = self._job_states[job_id]
        state = states.pop(0) if len(states) > 1 else states[0]
        if state == "FATAL":
            return {"state": "DONE", "error_result": {"reason": "invalid"},
                    "errors": [{"reason": "invalid"}]}
        return {"state": state, "error_result": None, "errors": self.non_fatal}

    def delete_files(self, files):
        self.deleted.append(list(files))


def _run(svc, files, **kw):
    sleeps: list[float] = []
    res = load_files_to_bigquery(
        svc, "ds", "tbl", files, {"fields": []}, sleep=sleeps.append, **kw
    )
    return res, sleeps


def test_bundle_files_respects_size_limit():
    sizes = {"a": 40, "b": 50, "c": 20, "d": 100, "e": 1}
    got = bundle_files(["a", "b", "c", "d", "e"], sizes.get, size_limit=100)
    # greedy, order-preserving: d alone fills a bundle, so e starts fresh
    assert got == [["a", "b"], ["c"], ["d"], ["e"]]
    # an oversized single file still becomes its own bundle
    assert bundle_files(["d"], sizes.get, size_limit=10) == [["d"]]


def test_happy_path_polls_until_done_then_cleans_up():
    svc = FakeService(state_script=["PENDING", "PENDING", "RUNNING", "DONE"])
    res, sleeps = _run(svc, ["f1", "f2"])
    assert [r.state for r in res] == ["DONE"]
    assert res[0].attempts == 1
    assert res[0].poll_count == 4
    assert svc.deleted == [["f1", "f2"]]  # cleanup after success
    # backoff doubles from min toward max cap (10 → 20 → 30 → 30 ...)
    assert sleeps[:3] == [10.0, 20.0, 30.0]


def test_fatal_error_resubmits_bundle():
    svc = FakeService(fatal_on_submission={1})
    res, _ = _run(svc, ["f1"])
    assert res[0].state == "DONE"
    assert res[0].attempts == 2
    assert svc.submissions == [["f1"], ["f1"]]  # same bundle resubmitted
    assert svc.deleted == [["f1"]]  # cleanup only after the success


def test_retries_exhausted_marks_failed_and_keeps_files():
    svc = FakeService(fatal_on_submission={1, 2, 3})
    res, _ = _run(svc, ["f1"], max_retries=2)
    assert res[0].state == "FAILED"
    assert res[0].attempts == 3  # initial + 2 retries
    assert svc.deleted == []  # failed loads never delete inputs


def test_transient_poll_failures_are_retried_not_fatal():
    svc = FakeService(state_script=["DONE"], poll_raises_first_n=2)
    res, sleeps = _run(svc, ["f1"])
    assert res[0].state == "DONE"
    assert res[0].poll_count == 3  # 2 raising polls + 1 good one
    assert len(sleeps) == 2


def test_non_fatal_errors_recorded_but_job_completes():
    svc = FakeService(state_script=["DONE"], non_fatal=[{"reason": "trailing"}])
    res, _ = _run(svc, ["f1"])
    assert res[0].state == "DONE"
    assert res[0].non_fatal_errors == [{"reason": "trailing"}]
    assert svc.deleted == [["f1"]]


def test_cleanup_false_retains_files():
    svc = FakeService(state_script=["DONE"])
    res, _ = _run(svc, ["f1"], cleanup=False)
    assert res[0].state == "DONE"
    assert svc.deleted == []


def test_multiple_bundles_each_get_own_job():
    sizes = {f"f{i}": 60 for i in range(4)}
    svc = FakeService(sizes=sizes, state_script=["DONE"])
    res, _ = _run(svc, [f"f{i}" for i in range(4)], size_limit=100)
    assert len(res) == 4  # 60+60 > 100 → one file per bundle
    assert all(isinstance(r, LoadJobResult) and r.state == "DONE" for r in res)
    assert svc.submissions == [["f0"], ["f1"], ["f2"], ["f3"]]
