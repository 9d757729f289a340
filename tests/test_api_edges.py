"""Edge-route depth suite — the HTTP surface not covered by the
lifecycle tests: legacy/recover auth aliases, full WeChat OAuth
login/bind/conflict-merge flows (network mocked at the OAuth client
seam, the reference's pattern — tests/test_api_comprehensive.py:1983),
skip-follow-up / complete-dimension interview controls, license event
timelines + follow-default toggles, export asset lifecycle, appendix
PDF, and site-config.js.

Reference behaviors: web/server.py:11838-12160 (merge), :27692-28302
(auth routes), :44375-44719 (admin licenses), :43496-43647 (export
assets), :26935-26973 (site-config.js)."""

import tempfile

import pytest

from deepvision_tpu.web.server import create_app
from deepvision_tpu.web.wechat import WeChatOAuth

ADMIN_PHONE = "13800000001"

WECHAT_CFG = {
    "WECHAT_APP_ID": "wx-test-app",
    "WECHAT_APP_SECRET": "s3cret",
    "WECHAT_REDIRECT_URI": "https://example.com/api/auth/wechat/callback",
}


def _mkapp(tmp, extra=None):
    overrides = {
        "AI_MODE": "template",
        "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666",
        "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "SMS_SEND_COOLDOWN_SECONDS": 0,
        "SMS_DAILY_CAP": 1000,
    }
    overrides.update(extra or {})
    return create_app(data_dir=tmp, overrides=overrides)


@pytest.fixture()
def client():
    tmp = tempfile.TemporaryDirectory()
    app = _mkapp(tmp.name)
    c = app.test_client()
    yield c
    app.state.shutdown()
    tmp.cleanup()


@pytest.fixture()
def wx_client():
    tmp = tempfile.TemporaryDirectory()
    app = _mkapp(tmp.name, extra=WECHAT_CFG)
    c = app.test_client()
    yield c
    app.state.shutdown()
    tmp.cleanup()


def login(client, phone="13900000001"):
    client.post("/api/auth/sms/send-code", json_body={"phone": phone})
    r = client.post("/api/auth/login/code",
                    json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return r.get_json()["user"]


def make_session(client, topic="需求调研", mode="quick"):
    r = client.post("/api/sessions", json_body={
        "topic": topic, "scenario_id": "product-requirement",
        "interview_mode": mode,
    })
    assert r.status_code == 201, r.text
    return r.get_json()


def generate_report(client, sid):
    r = client.post(f"/api/sessions/{sid}/generate-report",
                    json_body={"force": True})
    assert r.status_code == 202, r.text
    client.app.state.report_queue.drain()
    status = client.get(f"/api/status/report-generation/{sid}").get_json()
    assert status["state"] == "completed", status
    return status["report_name"]


def _fake_identity(openid="o-abc", nickname="测试用户", unionid="u-abc"):
    return {"openid": openid, "nickname": nickname, "unionid": unionid}


# ---------------------------------------------------------------------------
# Auth aliases & recover flow
# ---------------------------------------------------------------------------

def test_legacy_password_auth_deprecated(client):
    for path in ("/api/auth/register", "/api/auth/login"):
        r = client.post(path, json_body={"username": "a", "password": "b"})
        assert r.status_code == 400
        assert "短信" in r.get_json()["error"]


def test_recover_flow_logs_in(client):
    phone = "13911112222"
    r = client.post("/api/auth/recover/send-code", json_body={"phone": phone})
    assert r.status_code == 200 and r.get_json()["ok"]
    r = client.post("/api/auth/recover/login",
                    json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200
    me = client.get("/api/auth/me").get_json()
    assert me["authenticated"] and me["user"]["phone"].endswith("2222")


def test_recover_send_requires_phone(client):
    assert client.post("/api/auth/recover/send-code",
                       json_body={}).status_code == 400


def test_send_code_rejects_non_numeric_phone(client):
    r = client.post("/api/auth/sms/send-code",
                    json_body={"phone": "abc-not-a-phone"})
    assert r.status_code == 400


# ---------------------------------------------------------------------------
# WeChat OAuth: login, bind, conflict -> server-side merge candidate
# ---------------------------------------------------------------------------

def test_bind_status_phone_only_user(client):
    login(client)
    st = client.get("/api/auth/bind/status").get_json()
    assert st["phone_bound"] is True
    assert st["wechat_bound"] is False
    assert st["wechat_nickname"] is None


def test_bind_wechat_start_requires_login_and_config(client, wx_client):
    # anonymous -> 401 regardless of configuration
    assert wx_client.get("/api/auth/bind/wechat/start").status_code == 401
    # logged in but unconfigured -> 503
    login(client)
    assert client.get("/api/auth/bind/wechat/start").status_code == 503
    # logged in + configured -> authorize URL with one-shot state
    login(wx_client)
    out = wx_client.get("/api/auth/bind/wechat/start").get_json()
    assert "open.weixin.qq.com" in out["authorize_url"]
    assert out["state"]


def test_wechat_login_creates_phoneless_account(wx_client, monkeypatch):
    monkeypatch.setattr(WeChatOAuth, "exchange_code",
                        lambda self, code: _fake_identity(openid="o-login"))
    start = wx_client.get("/api/auth/wechat/start").get_json()
    r = wx_client.get(
        f"/api/auth/wechat/callback?code=any&state={start['state']}")
    assert r.status_code == 200, r.text
    user = r.get_json()["user"]
    assert user["nickname"] == "测试用户"
    me = wx_client.get("/api/auth/me").get_json()
    assert me["authenticated"] is True
    # second login with the same openid resolves to the SAME account
    wx_client.post("/api/auth/logout")
    start2 = wx_client.get("/api/auth/wechat/start").get_json()
    r2 = wx_client.get(
        f"/api/auth/wechat/callback?code=any&state={start2['state']}")
    assert r2.get_json()["user"]["user_id"] == user["user_id"]


def test_wechat_bind_then_status(wx_client, monkeypatch):
    monkeypatch.setattr(WeChatOAuth, "exchange_code",
                        lambda self, code: _fake_identity(openid="o-bind"))
    login(wx_client)
    start = wx_client.get("/api/auth/bind/wechat/start").get_json()
    r = wx_client.get(
        f"/api/auth/wechat/callback?code=c&state={start['state']}")
    assert r.status_code == 200 and r.get_json()["bound"] is True
    st = wx_client.get("/api/auth/bind/status").get_json()
    assert st["wechat_bound"] is True
    assert st["wechat_nickname"] == "测试用户"


def test_wechat_bind_conflict_creates_merge_candidate(wx_client, monkeypatch):
    monkeypatch.setattr(WeChatOAuth, "exchange_code",
                        lambda self, code: _fake_identity(openid="o-dup"))
    # user A binds the identity
    a = login(wx_client, "13900000111")
    start = wx_client.get("/api/auth/bind/wechat/start").get_json()
    assert wx_client.get(
        f"/api/auth/wechat/callback?code=c&state={start['state']}"
    ).get_json()["bound"] is True
    wx_client.post("/api/auth/logout")
    # user B proves control of the same identity -> conflict, no steal
    b = login(wx_client, "13900000222")
    start = wx_client.get("/api/auth/bind/wechat/start").get_json()
    out = wx_client.get(
        f"/api/auth/wechat/callback?code=c&state={start['state']}"
    ).get_json()
    assert out["conflict"] is True and out["merge_available"] is True
    st = wx_client.get("/api/auth/bind/status").get_json()
    assert st["wechat_bound"] is False  # binding NOT transferred
    # merge preview comes from the server-side candidate; body ignored
    prev = wx_client.post("/api/auth/account-merge/preview",
                          json_body={"from_user_id": 999999}).get_json()
    assert prev["verified_via"] == "wechat"
    assert prev["from_user"]["user_id"] == a["user_id"]
    assert prev["into_user"]["user_id"] == b["user_id"]
    # masked summaries never leak the full phone
    assert "1390000011" not in str(prev["from_user"])
    r = wx_client.post("/api/auth/account-merge/apply",
                       json_body={"preview_token": prev["preview_token"]})
    assert r.status_code == 200, r.text
    st = wx_client.get("/api/auth/bind/status").get_json()
    assert st["wechat_bound"] is True  # identity moved by the merge


def test_merge_preview_without_candidate_400(client):
    login(client)
    r = client.post("/api/auth/account-merge/preview", json_body={})
    assert r.status_code == 400


# ---------------------------------------------------------------------------
# Interview controls: skip-follow-up / complete-dimension
# ---------------------------------------------------------------------------

def test_skip_follow_up_clears_pending(client):
    login(client)
    s = make_session(client)
    sid = s["session_id"]
    state = client.app.state
    sess = state.sessions.load(sid)
    sess["_pending_follow_up"] = {"question": "能展开说说吗？", "dimension": "d1"}
    state.sessions.save(sess)
    r = client.post(f"/api/sessions/{sid}/skip-follow-up", json_body={})
    assert r.status_code == 200
    assert "_pending_follow_up" not in state.sessions.load(sid)


def test_skip_follow_up_always_sets_confirm_flag(client):
    login(client)
    sid = make_session(client)["session_id"]
    r = client.post(f"/api/sessions/{sid}/skip-follow-up",
                    json_body={"always": True})
    assert r.status_code == 200
    sess = client.app.state.sessions.load(sid)
    assert sess["depth_v2"]["skip_followup_confirm"] is True


def test_complete_dimension_marks_and_moves_on(client):
    login(client)
    s = make_session(client)
    sid = s["session_id"]
    dims = list(s["dimensions"].keys())
    assert len(dims) >= 2
    r = client.post(f"/api/sessions/{sid}/complete-dimension",
                    json_body={"dimension": dims[0]})
    assert r.status_code == 200 and r.get_json()["dimension"] == dims[0]
    detail = client.get(f"/api/sessions/{sid}").get_json()
    assert detail["dimensions"][dims[0]]["completed"] is True
    # next question must come from a not-yet-completed dimension
    q = client.post(f"/api/sessions/{sid}/next-question",
                    json_body={}).get_json()
    assert q.get("dimension") != dims[0]


def test_complete_dimension_unknown_400(client):
    login(client)
    sid = make_session(client)["session_id"]
    r = client.post(f"/api/sessions/{sid}/complete-dimension",
                    json_body={"dimension": "no-such-dim"})
    assert r.status_code == 400


# ---------------------------------------------------------------------------
# License events + follow-default toggles
# ---------------------------------------------------------------------------

def test_license_event_timeline(client):
    login(client, ADMIN_PHONE)
    batch = client.post("/api/admin/licenses/batch", json_body={
        "count": 1, "level": "professional", "days_valid": 30,
        "batch_id": "evt-batch",
    })
    assert batch.status_code == 201
    code = batch.get_json()["codes"][0]
    client.post("/api/auth/logout")

    user = login(client, "13977778888")
    r = client.post("/api/licenses/activate", json_body={"code": code})
    assert r.status_code == 200, r.text
    lic_id = r.get_json()["license"]["license_id"]
    client.post("/api/auth/logout")

    login(client, ADMIN_PHONE)
    r = client.post(f"/api/admin/licenses/{lic_id}/extend",
                    json_body={"days": 15})
    assert r.status_code == 200
    r = client.post(f"/api/admin/licenses/{lic_id}/revoke",
                    json_body={"reason": "测试回收"})
    assert r.status_code == 200
    events = client.get(f"/api/admin/licenses/{lic_id}/events").get_json()
    kinds = [e["action"] for e in events]
    for expected in ("issued", "activated", "extended", "revoked"):
        assert expected in kinds, (expected, kinds)
    # revoked license no longer grants the level
    lic = client.get(f"/api/admin/licenses/{lic_id}").get_json()
    assert lic["status"] == "revoked"
    assert user["user_id"]  # silence unused warning


def test_license_enforcement_follow_default(client):
    login(client, ADMIN_PHONE)
    default = client.get("/api/admin/license-enforcement").get_json()
    flipped = not default["enabled"]
    r = client.post("/api/admin/license-enforcement",
                    json_body={"enabled": flipped})
    assert r.get_json()["enabled"] is flipped
    r = client.post("/api/admin/license-enforcement/follow-default",
                    json_body={})
    assert r.get_json()["enabled"] == default["enabled"]


def test_presentation_feature_follow_default(client):
    login(client, ADMIN_PHONE)
    client.post("/api/admin/presentation-feature",
                json_body={"enabled": True})
    assert client.get(
        "/api/admin/presentation-feature").get_json()["enabled"] is True
    r = client.post("/api/admin/presentation-feature/follow-default",
                    json_body={})
    assert r.status_code == 200
    after = client.get("/api/admin/presentation-feature").get_json()
    assert after["source"] in ("default", "config", "env")


def test_license_admin_routes_require_admin(client):
    login(client, "13955556666")  # not an admin
    checks = [
        ("POST", "/api/admin/licenses/batch", {"count": 1}),
        ("GET", "/api/admin/licenses/1/events", None),
        ("POST", "/api/admin/licenses/1/revoke", {}),
        ("POST", "/api/admin/licenses/1/extend", {"days": 1}),
        ("POST", "/api/admin/license-enforcement/follow-default", {}),
        ("POST", "/api/admin/presentation-feature/follow-default", {}),
    ]
    for method, path, body in checks:
        if method == "GET":
            r = client.get(path)
        else:
            r = client.post(path, json_body=body or {})
        assert r.status_code == 403, (path, r.status_code)


# ---------------------------------------------------------------------------
# Export asset lifecycle + appendix PDF
# ---------------------------------------------------------------------------

def test_export_asset_lifecycle(client):
    user = login(client)
    client.app.state.auth.set_user_level(user["user_id"], "professional")
    sid = make_session(client)["session_id"]
    name = generate_report(client, sid)

    # markdown export (always allowed)
    r = client.post(f"/api/reports/{name}/exports",
                    json_body={"format": "markdown"})
    assert r.status_code == 201, r.text
    asset_id = r.get_json()["asset_id"]
    # docx + pdf exports produce valid magic bytes
    docx_id = client.post(f"/api/reports/{name}/exports",
                          json_body={"format": "docx"}).get_json()["asset_id"]
    pdf_id = client.post(f"/api/reports/{name}/exports",
                         json_body={"format": "pdf"}).get_json()["asset_id"]
    listing = client.get(f"/api/reports/{name}/exports").get_json()
    got = {a["asset_id"]: a["format"] for a in listing}
    assert got[asset_id] == "markdown"
    assert got[docx_id] == "docx" and got[pdf_id] == "pdf"
    body = client.get(f"/api/reports/{name}/exports/{docx_id}").data
    assert body[:2] == b"PK"  # OOXML zip container
    body = client.get(f"/api/reports/{name}/exports/{pdf_id}").data
    assert body[:5] == b"%PDF-"


def test_export_format_gated_by_level(client):
    login(client)  # experience level by default
    sid = make_session(client)["session_id"]
    name = generate_report(client, sid)
    r = client.post(f"/api/reports/{name}/exports",
                    json_body={"format": "appendix"})
    assert r.status_code == 403


def test_appendix_pdf_route(client):
    user = login(client)
    client.app.state.auth.set_user_level(user["user_id"], "professional")
    sid = make_session(client)["session_id"]
    name = generate_report(client, sid)
    r = client.get(f"/api/reports/{name}/appendix/pdf")
    assert r.status_code == 200, r.text
    assert r.data[:5] == b"%PDF-"


def test_export_unknown_format_400(client):
    login(client)
    sid = make_session(client)["session_id"]
    name = generate_report(client, sid)
    r = client.post(f"/api/reports/{name}/exports",
                    json_body={"format": "hologram"})
    assert r.status_code == 400


# ---------------------------------------------------------------------------
# site-config.js + config-center site-config roundtrip
# ---------------------------------------------------------------------------

def test_site_config_js(client):
    r = client.get("/site-config.js")
    assert r.status_code == 200
    assert r.headers.get("Content-Type", "").startswith(
        "application/javascript")
    assert r.text.startswith("window.SITE_CONFIG = ")
    assert '"aiMode"' in r.text and '"instanceScope"' in r.text
