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
