"""Security regression suite (reference tests/test_security_regression.py:1).

Covers: SMS test-code issuance-only semantics + verify attempt caps,
account-merge source derivation (server-side verified candidate only),
presentation route ownership, framework body-size cap, Secure cookie flag,
anonymous-write blocking, and cross-user owner checks.
"""

import tempfile

import pytest

from deepvision_tpu.web.server import create_app


@pytest.fixture()
def app():
    tmp = tempfile.TemporaryDirectory()
    a = create_app(data_dir=tmp.name, overrides={
        "AI_MODE": "template",
        "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666",
        "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": "13800000001",
    })
    a._tmp = tmp
    yield a
    a.state.shutdown()
    tmp.cleanup()


@pytest.fixture()
def client(app):
    return app.test_client()


def login(client, phone="13900000001"):
    r = client.post("/api/auth/sms/send-code", json_body={"phone": phone})
    assert r.status_code == 200, r.text
    r = client.post("/api/auth/login/code",
                    json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return r.get_json()["user"]


# ---------------------------------------------------------------------------
# SMS code semantics (reference web/server.py:11609-11689)
# ---------------------------------------------------------------------------

def test_test_code_requires_issuance(client):
    """SMS_TEST_CODE only fixes the issued code; login without a prior
    send-code for that phone must fail (no login-as-anyone)."""
    r = client.post("/api/auth/login/code",
                    json_body={"phone": "13711112222", "code": "666666"})
    assert r.status_code == 401


def test_test_code_cannot_elevate_to_admin(client):
    """Admin phone without an issued code must not be loggable-in via the
    fixed test code."""
    r = client.post("/api/auth/login/code",
                    json_body={"phone": "13800000001", "code": "666666"})
    assert r.status_code == 401


def test_issued_code_is_single_use(client):
    client.post("/api/auth/sms/send-code", json_body={"phone": "13955556666"})
    r = client.post("/api/auth/login/code",
                    json_body={"phone": "13955556666", "code": "666666"})
    assert r.status_code == 200
    client.post("/api/auth/logout")
    r = client.post("/api/auth/login/code",
                    json_body={"phone": "13955556666", "code": "666666"})
    assert r.status_code == 401


def test_verify_attempts_capped(app, client):
    client.post("/api/auth/sms/send-code", json_body={"phone": "13977778888"})
    for _ in range(app.state.auth.max_verify_attempts):
        r = client.post("/api/auth/login/code",
                        json_body={"phone": "13977778888", "code": "000000"})
        assert r.status_code == 401
    # even the correct code is now refused — brute-force window closed
    r = client.post("/api/auth/login/code",
                    json_body={"phone": "13977778888", "code": "666666"})
    assert r.status_code == 401


def test_production_refuses_sms_test_code():
    tmp = tempfile.TemporaryDirectory()
    from deepvision_tpu.web.server import StartupError
    with pytest.raises(StartupError):
        create_app(data_dir=tmp.name, overrides={
            "DEBUG_MODE": False,
            "SECRET_KEY": "x" * 32,
            "SMS_PROVIDER": "jdcloud",
            "SMS_TEST_CODE": "666666",
        })
    tmp.cleanup()


# ---------------------------------------------------------------------------
# Account merge (reference web/server.py:11838-12160)
# ---------------------------------------------------------------------------

def test_merge_preview_ignores_request_from_user_id(app):
    c1 = app.test_client()
    victim = login(c1, "13911110000")
    c2 = app.test_client()
    login(c2, "13922220000")
    r = c2.post("/api/auth/account-merge/preview",
                json_body={"from_user_id": victim["user_id"]})
    assert r.status_code == 400  # no server-side verified candidate


def test_merge_flow_via_verified_phone_conflict(app):
    c1 = app.test_client()
    login(c1, "13911110001")
    c2 = app.test_client()
    me = login(c2, "13922220002")
    # c2 proves control of c1's phone via SMS code -> conflict + candidate
    # (zero the send cooldown: c1's login just issued a code for this phone)
    app.state.auth.send_cooldown = 0
    r = c2.post("/api/auth/sms/send-code",
                json_body={"phone": "13911110001"})
    assert r.status_code == 200, r.text
    r = c2.post("/api/auth/bind/phone",
                json_body={"phone": "13911110001", "code": "666666"})
    assert r.status_code == 200
    body = r.get_json()
    assert body.get("conflict") and body.get("merge_available")
    # preview now works and returns only masked summaries
    r = c2.post("/api/auth/account-merge/preview", json_body={})
    assert r.status_code == 200
    prev = r.get_json()
    assert prev["from_user"]["phone"].count("*") == 4
    assert "is_admin" not in prev["from_user"]
    assert "level" not in prev["from_user"]
    # a different account cannot apply the stolen token
    c3 = app.test_client()
    login(c3, "13933330003")
    r = c3.post("/api/auth/account-merge/apply",
                json_body={"preview_token": prev["preview_token"]})
    assert r.status_code == 400
    # the owner can
    r = c2.post("/api/auth/account-merge/apply",
                json_body={"preview_token": prev["preview_token"]})
    assert r.status_code == 200
    assert r.get_json()["into"] == me["user_id"]


# ---------------------------------------------------------------------------
# Anonymous-write blocking + owner checks
# ---------------------------------------------------------------------------

WRITE_ROUTES = [
    ("/api/sessions", {"topic": "t"}),
    ("/api/sessions/dv-x/next-question", {}),
    ("/api/sessions/dv-x/submit-answer", {"answer": "a"}),
    ("/api/sessions/dv-x/generate-report", {}),
    ("/api/licenses/activate", {"code": "x"}),
    ("/api/auth/account-merge/preview", {}),
    ("/api/auth/account-merge/apply", {"preview_token": "x"}),
    ("/api/auth/bind/phone", {"phone": "1", "code": "1"}),
]


@pytest.mark.parametrize("path,body", WRITE_ROUTES)
def test_anonymous_writes_blocked(client, path, body):
    r = client.post(path, json_body=body)
    assert r.status_code == 401, f"{path} -> {r.status_code}"


def test_session_isolated_between_users(app):
    c1 = app.test_client()
    login(c1, "13944440004")
    r = c1.post("/api/sessions", json_body={"topic": "机密项目"})
    sid = r.get_json()["session_id"]
    c2 = app.test_client()
    login(c2, "13955550005")
    assert c2.get(f"/api/sessions/{sid}").status_code in (403, 404)
    assert c2.post(f"/api/sessions/{sid}/submit-answer",
                   json_body={"answer": "x"}).status_code in (403, 404)


def test_presentation_routes_require_ownership(app):
    c1 = app.test_client()
    login(c1, "13966660006")
    # create a report artifact owned by user 1
    state = app.state
    state.reports.save("r-owned.md", "# 秘密报告", owner_user_id="1",
                       instance_scope=state.instance_scope)
    c2 = app.test_client()
    login(c2, "13977770007")
    for path in (
        "/api/reports/r-owned.md/refly/status",
        "/api/reports/r-owned.md/presentation",
        "/api/reports/r-owned.md/presentation/link",
    ):
        r = c2.get(path)
        assert r.status_code in (403, 404), f"{path} -> {r.status_code}"
    r = c2.post("/api/reports/r-owned.md/presentation/abort", json_body={})
    assert r.status_code in (403, 404)


# ---------------------------------------------------------------------------
# Framework hardening
# ---------------------------------------------------------------------------

def test_oversized_content_length_rejected_before_read(app):
    app.max_content_length = 1024
    c = app.test_client()
    r = c.open("/api/auth/sms/send-code", method="POST",
               data=b"{}", headers={"Content-Length": str(10 ** 9)})
    assert r.status_code == 413


def test_session_cookie_secure_flag(app):
    app.session_cookie_secure = True
    c = app.test_client()
    r = c.post("/api/auth/sms/send-code", json_body={"phone": "13910102020"})
    assert r.status_code == 200
    r = c.post("/api/auth/login/code",
               json_body={"phone": "13910102020", "code": "666666"})
    cookie = r.headers.get("Set-Cookie", "")
    assert "Secure" in cookie, cookie
