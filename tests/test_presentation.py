"""Presentation workflow service: state machine without network."""

import tempfile

import pytest

from deepvision_tpu.web.runtime.presentation import PresentationService
from deepvision_tpu.web.server import AppState


@pytest.fixture()
def state():
    tmp = tempfile.TemporaryDirectory()
    st = AppState(data_dir=tmp.name, overrides={
        "AI_MODE": "off", "ENABLE_AI": False, "DEBUG_MODE": True,
    })
    yield st
    st.shutdown()
    tmp.cleanup()


def test_idle_status(state):
    svc = PresentationService(state)
    assert svc.status("nope.md") == {"active": False, "state": "idle"}


def test_start_without_refly_uses_local_mode(state):
    import time as _t

    svc = PresentationService(state)
    out = svc.start("r.md", "# content\n\n## 概述\n\n要点")
    assert out["mode"] == "local"
    for _ in range(40):  # wait for the worker so teardown never races it
        if svc.status("r.md").get("state") in ("completed", "failed"):
            break
        _t.sleep(0.25)
    assert svc.status("r.md")["state"] == "completed"


def test_abort_without_run(state):
    svc = PresentationService(state)
    assert svc.abort("r.md")["aborted"] is False


def test_status_persists_across_instances(state):
    svc = PresentationService(state)
    svc._save("r.md", {"active": False, "state": "completed",
                       "storage_key": "exports/r.md/x/y.pdf"})
    svc2 = PresentationService(state)
    st = svc2.status("r.md")
    assert st["state"] == "completed"
    assert st["storage_key"].startswith("exports/")


def test_local_presentation_without_refly(tmp_path):
    """No REFLY_API_URL -> the presentation chain still completes using
    the in-process slide PDF (zero-egress deployments get a working
    feature instead of a dead flag)."""
    import time

    from deepvision_tpu.web.server import AppState
    from deepvision_tpu.web.runtime.presentation import PresentationService

    state = AppState(data_dir=str(tmp_path), overrides={
        "AI_MODE": "template", "SMS_PROVIDER": "mock", "DEBUG_MODE": True,
    })
    try:
        svc = PresentationService(state)
        out = svc.start("local-deck.md",
                        "# 报告\n\n## 概述\n\n要点一。\n\n## 方案\n\n- 分阶段")
        assert out["mode"] == "local"
        for _ in range(40):
            st = svc.status("local-deck.md")
            if st.get("state") in ("completed", "failed"):
                break
            time.sleep(0.25)
        assert st["state"] == "completed", st
        from deepvision_tpu.web.object_storage import (
            ObjectStorageHistoryService,
        )

        pdf = ObjectStorageHistoryService(state).backend.get_object(
            st["storage_key"])
        assert pdf.startswith(b"%PDF")
    finally:
        state.shutdown()


def test_local_presentation_pdf_builder():
    from deepvision_tpu.web.runtime.presentation import (
        build_presentation_pdf,
    )

    pdf = build_presentation_pdf(
        "# r\n\n## 第一章\n\n内容要点。\n\n## 第二章\n\n- 已是列表",
        title="测试")
    assert pdf.startswith(b"%PDF") and len(pdf) > 500


# ---------------------------------------------------------------------------
# remote Refly workflow over mocked HTTP (reference run_refly_workflow
# :33497 / poll_refly_execution :33516 / select_best_refly_candidate
# :33835 — upload, poll, score/select, download, archive, abort)
# ---------------------------------------------------------------------------

class _FakeResp:
    def __init__(self, payload=None, content=b""):
        self.payload = payload or {}
        self.content = content

    def raise_for_status(self):
        pass

    def json(self):
        return self.payload


class _FakeRefly:
    """Scriptable stand-in for the Refly HTTP API."""

    def __init__(self, poll_results, candidates=None, pdf=b"%PDF-fake"):
        self.poll_results = list(poll_results)
        self.candidates = candidates or []
        self.pdf = pdf
        self.posts = []
        self.gets = []

    def post(self, url, json=None, headers=None, timeout=None):
        self.posts.append((url, json, headers))
        return _FakeResp({"execution_id": "exec-42"})

    def get(self, url, headers=None, timeout=None):
        self.gets.append(url)
        if "/executions/" in url:
            status = (self.poll_results.pop(0) if self.poll_results
                      else "succeeded")
            payload = {"status": status}
            if status == "succeeded":
                payload["outputs"] = self.candidates
            if status == "failed":
                payload["error"] = "workflow exploded"
            return _FakeResp(payload)
        return _FakeResp(content=self.pdf)


@pytest.fixture()
def remote_state(monkeypatch):
    tmp = tempfile.TemporaryDirectory()
    st = AppState(data_dir=tmp.name, overrides={
        "AI_MODE": "off", "ENABLE_AI": False, "DEBUG_MODE": True,
        "REFLY_API_URL": "https://refly.example/api",
        "REFLY_API_KEY": "refly-secret",
    })
    monkeypatch.setattr("time.sleep", lambda s: None)
    yield st, monkeypatch, tmp.name
    st.shutdown()
    tmp.cleanup()


def _run_remote(st, monkeypatch, fake):
    import requests

    monkeypatch.setattr(requests, "post", fake.post)
    monkeypatch.setattr(requests, "get", fake.get)
    svc = PresentationService(st)
    svc.start("报告A.md", "# 报告A\n\n## 章节\n内容")
    t = svc._threads.get("报告A.md")
    if t is not None:
        t.join(timeout=30)
    return svc, svc.status("报告A.md")


def test_remote_success_selects_best_candidate(remote_state):
    st, monkeypatch, _ = remote_state
    fake = _FakeRefly(
        poll_results=["running", "running", "succeeded"],
        candidates=[
            {"score": 0.6, "pages": 10, "url": "https://r/low.pdf"},
            {"score": 0.9, "pages": 8, "url": "https://r/best.pdf"},
            {"score": 0.9, "pages": 6, "url": "https://r/tie.pdf"},
        ])
    svc, status = _run_remote(st, monkeypatch, fake)
    assert status["state"] == "completed", status
    # highest score wins; ties break by page count
    assert status["candidate"]["url"] == "https://r/best.pdf"
    assert status["storage_key"]
    # auth header rode every call
    assert fake.posts[0][2]["Authorization"] == "Bearer refly-secret"
    # polled until terminal status
    assert sum("/executions/" in u for u in fake.gets) == 3


def test_remote_failed_execution_reports_error(remote_state):
    st, monkeypatch, _ = remote_state
    fake = _FakeRefly(poll_results=["running", "failed"])
    _, status = _run_remote(st, monkeypatch, fake)
    assert status["state"] == "failed"
    assert "workflow exploded" in status["error"]


def test_remote_no_usable_candidate_fails(remote_state):
    st, monkeypatch, _ = remote_state
    fake = _FakeRefly(poll_results=["succeeded"],
                      candidates=[{"score": 0.9, "pages": 3}])  # no url
    _, status = _run_remote(st, monkeypatch, fake)
    assert status["state"] == "failed"
    assert "no usable candidate" in status["error"]


def test_remote_network_error_fails_cleanly(remote_state):
    st, monkeypatch, _ = remote_state
    import requests

    def boom(*a, **kw):
        raise requests.ConnectionError("refused")
    monkeypatch.setattr(requests, "post", boom)
    svc = PresentationService(st)
    svc.start("报告A.md", "内容")
    t = svc._threads.get("报告A.md")
    if t is not None:
        t.join(timeout=30)
    status = svc.status("报告A.md")
    assert status["state"] == "failed"
    assert "ConnectionError" in status["error"]


def test_remote_abort_mid_poll(remote_state):
    st, monkeypatch, _ = remote_state
    svc = PresentationService(st)
    import threading as _th

    import requests
    started = _th.Event()

    def slow_get(url, headers=None, timeout=None):
        started.set()
        return _FakeResp({"status": "running"})
    monkeypatch.setattr(requests, "post",
                        _FakeRefly([]).post)
    monkeypatch.setattr(requests, "get", slow_get)
    svc.start("报告A.md", "内容")
    assert started.wait(timeout=20)
    out = svc.abort("报告A.md")
    assert out["aborted"] is True
    t = svc._threads.get("报告A.md")
    if t is not None:
        t.join(timeout=30)
    assert svc.status("报告A.md")["state"] == "aborted"
