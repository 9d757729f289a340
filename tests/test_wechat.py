"""WeChat OAuth: state machine + nickname repair (no network)."""

from deepvision_tpu.web.wechat import WeChatOAuth, repair_nickname


def test_unconfigured():
    w = WeChatOAuth("", "", "")
    assert not w.configured


def test_start_url_and_state_lifecycle():
    w = WeChatOAuth("appid", "secret", "https://x/cb")
    out = w.start_url("login")
    assert "open.weixin.qq.com" in out["authorize_url"]
    assert "appid=appid" in out["authorize_url"]
    state = out["state"]
    assert w.consume_state(state) == "login"
    assert w.consume_state(state) is None  # one-shot


def test_nickname_repair():
    good = "张三"
    mangled = good.encode("utf-8").decode("latin-1")
    assert repair_nickname(mangled) == good
    assert repair_nickname(good) == good
    assert repair_nickname(None) == "微信用户"
    assert repair_nickname("Alice") == "Alice"


def test_wechat_routes_gated(tmp_path):
    from deepvision_tpu.web.server import create_app

    app = create_app(data_dir=str(tmp_path), overrides={
        "AI_MODE": "off", "ENABLE_AI": False, "DEBUG_MODE": True,
    })
    try:
        c = app.test_client()
        assert c.get("/api/auth/wechat/start").status_code == 503
        assert c.get("/api/auth/wechat/callback?code=x&state=y"
                     ).status_code == 503
    finally:
        app.state.shutdown()


def test_wechat_start_configured(tmp_path):
    from deepvision_tpu.web.server import create_app

    app = create_app(data_dir=str(tmp_path), overrides={
        "AI_MODE": "off", "ENABLE_AI": False, "DEBUG_MODE": True,
        "WECHAT_APP_ID": "wx123", "WECHAT_APP_SECRET": "s",
        "WECHAT_REDIRECT_URI": "https://example.com/cb",
    })
    try:
        c = app.test_client()
        data = c.get("/api/auth/wechat/start").get_json()
        assert "authorize_url" in data and "state" in data
        # bad callback state
        r = c.get("/api/auth/wechat/callback?code=abc&state=forged")
        assert r.status_code == 400
    finally:
        app.state.shutdown()


# ---------------------------------------------------------------------------
# full OAuth flows through the routes, with exchange_code mocked (the
# reference mocks token/profile fetch the same way,
# tests/test_api_comprehensive.py:1983-2006)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

from deepvision_tpu.web.wechat import WeChatOAuth as _WX  # noqa: E402


@pytest.fixture()
def wx_app(tmp_path, monkeypatch):
    from deepvision_tpu.web.server import create_app

    app = create_app(data_dir=str(tmp_path), overrides={
        "AI_MODE": "off", "ENABLE_AI": False, "DEBUG_MODE": True,
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "WECHAT_APP_ID": "wx123", "WECHAT_APP_SECRET": "s",
        "WECHAT_REDIRECT_URI": "https://example.com/cb",
    })
    identities = {}

    def fake_exchange(self, code):
        if code == "boom":
            raise RuntimeError("gateway down")
        return identities.get(code) or {
            "openid": f"openid-{code}", "unionid": "",
            "nickname": f"微信用户{code}"}
    monkeypatch.setattr(_WX, "exchange_code", fake_exchange)
    yield app, identities
    app.state.shutdown()


def _start_and_callback(client, code, purpose_path="/api/auth/wechat/start"):
    state_token = client.get(purpose_path).get_json()["state"]
    return client.get(
        f"/api/auth/wechat/callback?code={code}&state={state_token}")


def _sms_login(app, phone):
    c = app.test_client()
    c.post("/api/auth/sms/send-code", json_body={"phone": phone})
    r = c.post("/api/auth/login/code",
               json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return c


def test_wechat_login_creates_and_reuses_account(wx_app):
    app, _ = wx_app
    c = app.test_client()
    r = _start_and_callback(c, "alice")
    assert r.status_code == 200, r.text
    me = c.get("/api/auth/me").get_json()
    assert me["authenticated"] is True
    uid = me["user"]["user_id"]
    assert "微信用户alice" in (me["user"]["nickname"] or "")
    # second login with the same openid lands on the SAME account
    c2 = app.test_client()
    assert _start_and_callback(c2, "alice").status_code == 200
    assert c2.get("/api/auth/me").get_json()["user"]["user_id"] == uid


def test_wechat_bind_happy_path_and_status(wx_app):
    app, _ = wx_app
    c = _sms_login(app, "13900002001")
    r = _start_and_callback(c, "bob", "/api/auth/bind/wechat/start")
    assert r.status_code == 200 and r.get_json()["bound"] is True
    status = c.get("/api/auth/bind/status").get_json()
    assert status["wechat_bound"] is True
    assert status["wechat_nickname"] == "微信用户bob"


def test_wechat_bind_conflict_offers_merge_and_apply(wx_app):
    app, _ = wx_app
    # user A owns the wechat identity
    a = app.test_client()
    assert _start_and_callback(a, "carol").status_code == 200
    a_uid = a.get("/api/auth/me").get_json()["user"]["user_id"]
    # user B (SMS account) tries to bind the same identity
    b = _sms_login(app, "13900002002")
    r = _start_and_callback(b, "carol", "/api/auth/bind/wechat/start")
    body = r.get_json()
    assert body["conflict"] is True and body["merge_available"] is True
    # merge preview names the other account; apply moves the binding
    prev = b.post("/api/auth/account-merge/preview", json_body={})
    assert prev.status_code == 200, prev.text
    body_p = prev.get_json()
    assert body_p["verified_via"] == "wechat"
    applied = b.post("/api/auth/account-merge/apply",
                     json_body={"preview_token": body_p["preview_token"]})
    assert applied.status_code == 200, applied.text
    status = b.get("/api/auth/bind/status").get_json()
    assert status["wechat_bound"] is True
    # the losing wechat-only account no longer resolves to the identity
    c2 = app.test_client()
    assert _start_and_callback(c2, "carol").status_code == 200
    merged_uid = c2.get("/api/auth/me").get_json()["user"]["user_id"]
    assert merged_uid != a_uid


def test_wechat_exchange_failure_is_502(wx_app):
    app, _ = wx_app
    c = app.test_client()
    r = _start_and_callback(c, "boom")
    assert r.status_code == 502
    assert "微信授权失败" in r.get_json()["error"]


def test_wechat_state_cannot_be_replayed_across_purposes(wx_app):
    app, _ = wx_app
    c = _sms_login(app, "13900002003")
    # a login-purpose state consumed through the callback cannot be
    # replayed: second use is a 400
    state_token = c.get("/api/auth/wechat/start").get_json()["state"]
    assert c.get(f"/api/auth/wechat/callback?code=x&state={state_token}"
                 ).status_code == 200
    assert c.get(f"/api/auth/wechat/callback?code=x&state={state_token}"
                 ).status_code == 400
