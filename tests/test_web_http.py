"""Micro-framework tests: routing, JSON, sessions, multipart, errors."""

from deepvision_tpu.web.http import App, HTTPError, Response, jsonify
import pytest

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


def make_app():
    app = App("t", secret_key="test-secret")

    @app.route("/hello")
    def hello(req):
        return {"msg": "hi"}

    @app.route("/echo", methods=["POST"])
    def echo(req):
        return jsonify(req.get_json())

    @app.route("/items/<item_id>")
    def item(req, item_id):
        return {"id": item_id}

    @app.route("/files/<path:name>")
    def file_route(req, name):
        return {"name": name}

    @app.route("/num/<int:n>")
    def num(req, n):
        return {"n": int(n)}

    @app.route("/login", methods=["POST"])
    def login(req):
        req.session["user"] = req.get_json().get("user")
        return {"ok": True}

    @app.route("/me")
    def me(req):
        return {"user": req.session.get("user")}

    @app.route("/boom")
    def boom(req):
        raise HTTPError(429, {"error": "slow down"},
                        headers={"Retry-After": "2"})

    @app.route("/upload", methods=["POST"])
    def upload(req):
        f = req.files.get("doc")
        return {"filename": f.filename, "size": len(f),
                "note": req.form.get("note")}

    return app


def test_routing_and_json():
    c = make_app().test_client()
    assert c.get("/hello").get_json() == {"msg": "hi"}
    assert c.post("/echo", json_body={"a": 1}).get_json() == {"a": 1}
    assert c.get("/items/abc-123").get_json() == {"id": "abc-123"}
    assert c.get("/files/a/b/c.md").get_json() == {"name": "a/b/c.md"}
    assert c.get("/num/42").get_json() == {"n": 42}


def test_404_and_405():
    c = make_app().test_client()
    assert c.get("/nope").status_code == 404
    assert c.get("/echo").status_code == 405


def test_session_cookie_roundtrip():
    c = make_app().test_client()
    assert c.get("/me").get_json() == {"user": None}
    c.post("/login", json_body={"user": "u1"})
    assert c.get("/me").get_json() == {"user": "u1"}


def test_session_tamper_rejected():
    c = make_app().test_client()
    c.post("/login", json_body={"user": "u1"})
    c._cookies["dv_session"] = c._cookies["dv_session"][:-4] + "XXXX"
    assert c.get("/me").get_json() == {"user": None}


def test_http_error_with_headers():
    c = make_app().test_client()
    r = c.get("/boom")
    assert r.status_code == 429
    assert r.headers.get("Retry-After") == "2"
    assert r.get_json()["error"] == "slow down"


def test_multipart_upload():
    c = make_app().test_client()
    r = c.post(
        "/upload",
        files={"doc": ("报告.md", "# 标题\n内容".encode("utf-8"), "text/markdown")},
        form={"note": "第一份"},
    )
    data = r.get_json()
    assert data["filename"] == "报告.md"
    assert data["size"] > 0
    assert data["note"] == "第一份"


def test_unhandled_exception_500():
    app = App("t")

    @app.route("/die")
    def die(req):
        raise ValueError("x")

    r = app.test_client().get("/die")
    assert r.status_code == 500
    assert "error" in r.get_json()
