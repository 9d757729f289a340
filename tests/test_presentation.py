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


def test_start_requires_config(state):
    svc = PresentationService(state)
    with pytest.raises(RuntimeError):
        svc.start("r.md", "# content")


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
