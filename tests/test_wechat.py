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
