"""Scenario loader: builtins, custom round-trip, validation, recognition."""

import os
import tempfile

import pytest

from deepvision_tpu.web.meta_index import MetaIndex
from deepvision_tpu.web.scenarios import (
    ScenarioLoader,
    generate_scenario_from_description,
    validate_scenario,
)
from deepvision_tpu.engine.client import ModelGateway

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


@pytest.fixture()
def loader():
    tmp = tempfile.TemporaryDirectory()
    meta = MetaIndex(os.path.join(tmp.name, "m.sqlite3"))
    yield ScenarioLoader(meta, custom_dir=os.path.join(tmp.name, "custom"))
    tmp.cleanup()


def test_eight_builtins_load(loader):
    builtins = loader.builtins()
    assert len(builtins) == 8
    for sc in builtins.values():
        assert not validate_scenario(sc), sc["id"]
        assert all(d.get("key_aspects") for d in sc["dimensions"])


def test_custom_roundtrip(loader):
    saved = loader.save_custom(
        {"id": "custom-x", "name": "自定义", "description": "d",
         "dimensions": [{"id": "d1", "name": "维度一"}]},
        owner_user_id="7",
    )
    assert loader.get("custom-x")["name"] == "自定义"
    assert "custom-x" in {s["id"] for s in loader.list_all()}
    assert loader.delete_custom("custom-x")
    assert loader.get("custom-x") is None


def test_invalid_custom_rejected(loader):
    with pytest.raises(ValueError):
        loader.save_custom({"name": "缺维度", "description": "d",
                            "id": "bad", "dimensions": []})


def test_recognition_ranks_by_keywords(loader):
    matches = loader.recognize("我们想做竞品 对比 分析")
    assert matches and matches[0]["scenario_id"] == "competitive-analysis"
    assert loader.recognize("毫无关联的文字 xyzzy") == []


def test_ai_generation_falls_back_on_garbage():
    gw = ModelGateway(mode="off")
    sc = generate_scenario_from_description(
        type("G", (), {"call_model": staticmethod(
            lambda *a, **k: "完全不是 JSON 的回复")})(), "智能仓储调研",
    )
    assert not validate_scenario(sc)
    assert sc["dimensions"]
