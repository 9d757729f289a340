"""Multi-model co-residency: distinct lane models -> distinct engines."""

import tempfile

import pytest


def test_distinct_models_create_distinct_engines(monkeypatch):
    tmp = tempfile.TemporaryDirectory()
    from deepvision_tpu.web.server import AppState

    state = AppState(data_dir=tmp.name, overrides={
        "AI_MODE": "engine",
        "QUESTION_MODEL_NAME": "dv-tiny-test",
        "REPORT_MODEL_NAME": "dv-tiny-test",
        "REPORT_DRAFT_MODEL_NAME": "dv-smoke",
        "REPORT_REVIEW_MODEL_NAME": "dv-smoke",
        "ENGINE_NUM_PAGES": 32,
        "ENGINE_PAGE_SIZE": 16,
        "ENGINE_MAX_PAGES_PER_SEQ": 4,
        "ENGINE_MAX_SLOTS": 2,
        "DEBUG_MODE": True,
    })
    try:
        assert set(state.gateway.engines) == {"dv-tiny-test", "dv-smoke"}
        assert state.gateway.lanes["question"].engine == "dv-tiny-test"
        assert state.gateway.lanes["report_draft"].engine == "dv-smoke"
        assert state.gateway.lanes["report_review"].engine == "dv-smoke"
        # engine resolution in the gateway picks the lane's replica
        q_engine = state.gateway.engines[
            state.gateway.lanes["question"].engine]
        assert q_engine.model_cfg.name == "dv-tiny-test"
    finally:
        state.shutdown()
        tmp.cleanup()


def test_single_model_creates_one_engine():
    tmp = tempfile.TemporaryDirectory()
    from deepvision_tpu.web.server import AppState

    state = AppState(data_dir=tmp.name, overrides={
        "AI_MODE": "engine",
        "QUESTION_MODEL_NAME": "dv-tiny-test",
        "REPORT_MODEL_NAME": "dv-tiny-test",
        "REPORT_DRAFT_MODEL_NAME": "dv-tiny-test",
        "REPORT_REVIEW_MODEL_NAME": "dv-tiny-test",
        "ENGINE_NUM_PAGES": 32,
        "ENGINE_PAGE_SIZE": 16,
        "ENGINE_MAX_PAGES_PER_SEQ": 4,
        "ENGINE_MAX_SLOTS": 2,
        "DEBUG_MODE": True,
    })
    try:
        assert len(state.gateway.engines) == 1
    finally:
        state.shutdown()
        tmp.cleanup()
