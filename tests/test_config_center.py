"""Typed admin config center: descriptors, validation, file writers,
restart persistence (reference _admin_setting web/server.py:2755-3289 and
file writers :3741-3848)."""

import json
import os

import pytest

from deepvision_tpu.web import config as config_defaults
from deepvision_tpu.web import config_center as cc


def test_every_descriptor_maps_to_a_real_config_key():
    for d in cc.DESCRIPTORS:
        assert hasattr(config_defaults, d.key), d.key


def test_descriptor_defaults_round_trip_their_own_type():
    for d in cc.DESCRIPTORS:
        # the shipped default must pass the descriptor's own validation
        assert cc.coerce(d, d.default) == cc.coerce(d, cc.coerce(d, d.default))


def test_coerce_bool_int_choice():
    b = cc.BY_KEY["ENABLE_AI"]
    assert cc.coerce(b, "true") is True
    assert cc.coerce(b, "0") is False
    with pytest.raises(ValueError):
        cc.coerce(b, "maybe")
    i = cc.BY_KEY["ENGINE_MAX_SLOTS"]
    assert cc.coerce(i, "16") == 16
    with pytest.raises(ValueError):
        cc.coerce(i, 0)          # below min
    with pytest.raises(ValueError):
        cc.coerce(i, "lots")
    ch = cc.BY_KEY["AI_MODE"]
    assert cc.coerce(ch, "engine") == "engine"
    with pytest.raises(ValueError):
        cc.coerce(ch, "remote")


def test_sensitive_values_are_masked():
    d = cc.BY_KEY["SECRET_KEY"]
    assert cc.mask(d, "super-secret-value") == "su****ue"
    assert cc.mask(d, "") == ""
    assert cc.mask(cc.BY_KEY["ENGINE_MAX_SLOTS"], 32) == 32


def test_env_writer_preserves_comments_and_unknown_keys(tmp_path):
    path = str(tmp_path / ".env")
    with open(path, "w") as fh:
        fh.write("# deployment config\nAI_MODE=template\n"
                 "CUSTOM_THING=keepme\n\n# trailing comment\n")
    cc.write_env_file(path, {"AI_MODE": "engine", "ENGINE_MAX_SLOTS": 16,
                             "ENABLE_AI": True})
    body = open(path).read()
    assert "# deployment config" in body
    assert "CUSTOM_THING=keepme" in body
    assert "# trailing comment" in body
    assert "AI_MODE=engine" in body and "AI_MODE=template" not in body
    assert "ENGINE_MAX_SLOTS=16" in body      # appended to managed block
    assert "ENABLE_AI=true" in body           # bool formatting


def test_site_config_js_excludes_sensitive(tmp_path):
    path = str(tmp_path / "site-config.js")
    cc.write_site_config_js(path, {
        "AI_MODE": "engine", "SECRET_KEY": "leak", "NOT_A_KEY": 1,
    })
    body = open(path).read()
    assert body.startswith("// generated")
    payload = json.loads(body.split("=", 1)[1].rstrip().rstrip(";"))
    assert payload == {"AI_MODE": "engine"}


def test_admin_saves_survive_restart(tmp_path):
    """Config-center saves persist in site_config_store and are restored
    into the resolver on the next boot."""
    from deepvision_tpu.web.server import AppState

    data_dir = str(tmp_path / "data")
    s1 = AppState(data_dir=data_dir, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666"})
    result = cc.apply_updates(
        s1.resolver, s1.meta,
        {"QUESTION_MAX_PENDING": "24", "BOGUS": 1, "ENGINE_MAX_SLOTS": -1},
    )
    assert result["applied"] == {"QUESTION_MAX_PENDING": 24}
    assert "BOGUS" in result["errors"]
    assert "ENGINE_MAX_SLOTS" in result["errors"]
    assert s1.resolver.get("QUESTION_MAX_PENDING") == 24
    s1.close() if hasattr(s1, "close") else None

    s2 = AppState(data_dir=data_dir, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666"})
    assert s2.resolver.get("QUESTION_MAX_PENDING") == 24
    # explicit process overrides outrank persisted saves
    s3 = AppState(data_dir=data_dir, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "QUESTION_MAX_PENDING": 5})
    assert s3.resolver.get("QUESTION_MAX_PENDING") == 5
