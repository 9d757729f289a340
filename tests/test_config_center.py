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


# ---------------------------------------------------------------------------
# write paths through the admin routes (reference admin config center
# file writers web/server.py:3741-3848 + typed descriptors :2755-3289)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


@pytest.fixture()
def admin_client(tmp_path):
    from deepvision_tpu.web.http import TestClient as HttpClient
    from deepvision_tpu.web.server import create_app

    app = create_app(data_dir=str(tmp_path), overrides={
        "AI_MODE": "off", "ENABLE_AI": False, "DEBUG_MODE": True,
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "ADMIN_PHONE_NUMBERS": "13800000001",
    })
    c = HttpClient(app)
    c.post("/api/auth/sms/send-code", json_body={"phone": "13800000001"})
    c.post("/api/auth/login/code",
           json_body={"phone": "13800000001", "code": "666666"})
    yield app, c
    app.state.shutdown()


def test_save_applies_typed_values_and_rejects_bad(admin_client):
    app, c = admin_client
    r = c.post("/api/admin/config-center/save", json_body={"updates": {
        "QUESTION_FAST_TIMEOUT": "45",       # int coercion from string
        "PREFETCH_IDLE_ONLY": "false",       # bool coercion
        "NOT_A_REAL_KEY": "x",               # unknown -> error
        
    }})
    body = r.get_json()
    assert body["applied"].get("QUESTION_FAST_TIMEOUT") == 45
    assert body["applied"].get("PREFETCH_IDLE_ONLY") is False
    assert "NOT_A_REAL_KEY" in body["errors"]
    assert body["ok"] is False               # partial failure flagged
    # the runtime resolver sees the new values immediately
    assert app.state.resolver.get_int("QUESTION_FAST_TIMEOUT") == 45
    assert app.state.resolver.get_bool("PREFETCH_IDLE_ONLY", True) is False


def test_save_rejects_out_of_type_values(admin_client):
    app, c = admin_client
    r = c.post("/api/admin/config-center/save", json_body={"updates": {
        "QUESTION_FAST_TIMEOUT": "not-a-number",
    }})
    body = r.get_json()
    assert body["ok"] is False and "QUESTION_FAST_TIMEOUT" in body["errors"]
    # value unchanged
    assert app.state.resolver.get_int("QUESTION_FAST_TIMEOUT", 60) != 0


def test_save_persists_to_env_file_with_raw_values(admin_client,
                                                   tmp_path):
    app, c = admin_client
    r = c.post("/api/admin/config-center/save", json_body={
        "updates": {"QUESTION_FAST_TIMEOUT": 30},
        "persist": "env_file",
    })
    assert r.get_json()["ok"] is True
    env_path = os.path.join(app.state.data_dir, ".env")
    with open(env_path, encoding="utf-8") as fh:
        content = fh.read()
    assert "QUESTION_FAST_TIMEOUT=30" in content


def test_saved_values_survive_restart_via_store(admin_client):
    app, c = admin_client
    c.post("/api/admin/config-center/save", json_body={"updates": {
        "QUESTION_FAST_TIMEOUT": 33}})
    # new AppState over the same data dir restores the override
    from deepvision_tpu.web.server import AppState

    st2 = AppState(data_dir=app.state.data_dir, overrides={
        "AI_MODE": "off", "ENABLE_AI": False, "DEBUG_MODE": True,
    })
    try:
        assert st2.resolver.get_int("QUESTION_FAST_TIMEOUT") == 33
    finally:
        st2.shutdown()


def test_payload_masks_secrets_and_marks_provenance(admin_client):
    app, c = admin_client
    c.post("/api/admin/config-center/save", json_body={"updates": {
        "REFLY_API_KEY": "super-secret-refly-key"}})
    payload = c.get("/api/admin/config-center").get_json()
    blob = __import__("json").dumps(payload, ensure_ascii=False)
    assert "super-secret-refly-key" not in blob
    # but the resolver holds the raw secret
    assert app.state.resolver.get_str("REFLY_API_KEY") == \
        "super-secret-refly-key"


def test_site_config_regeneration_route(admin_client):
    app, c = admin_client
    r = c.post("/api/admin/config-center/site-config", json_body={})
    assert r.status_code == 200, r.text
    path = os.path.join(app.state.data_dir, "site-config.js")
    assert os.path.isfile(path)
    with open(path, encoding="utf-8") as fh:
        js = fh.read()
    assert "SITE_CONFIG" in js
    # served to the frontend from the same file
    served = c.get("/site-config.js")
    assert served.status_code == 200
    assert "SITE_CONFIG" in served.text
