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


def test_engine_replicas_routed():
    """ENGINE_REPLICAS > 1 wraps each model in an EngineRouter
    (SURVEY.md §5.8 scale-out)."""
    import tempfile

    from deepvision_tpu.engine.router import EngineRouter
    from deepvision_tpu.web.server import AppState

    tmp = tempfile.TemporaryDirectory()
    state = AppState(data_dir=tmp.name, overrides={
        "AI_MODE": "engine",
        "QUESTION_MODEL_NAME": "dv-tiny-test",
        "REPORT_MODEL_NAME": "dv-tiny-test",
        "REPORT_DRAFT_MODEL_NAME": "dv-tiny-test",
        "REPORT_REVIEW_MODEL_NAME": "dv-tiny-test",
        "ENGINE_REPLICAS": 2,
        "ENGINE_NUM_PAGES": 32, "ENGINE_PAGE_SIZE": 16,
        "ENGINE_MAX_PAGES_PER_SEQ": 4, "ENGINE_MAX_SLOTS": 2,
        "DEBUG_MODE": True,
    })
    try:
        eng = state.gateway.engines["dv-tiny-test"]
        assert isinstance(eng, EngineRouter)
        text, meta = eng.generate_text("测试", max_tokens=2,
                                       temperature=0.0, timeout=120)
        assert "replica" in meta
        assert eng.stats()["router"]["replicas"] == 2
    finally:
        state.shutdown()
        tmp.cleanup()
