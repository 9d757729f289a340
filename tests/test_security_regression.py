"""Security regression suite (reference tests/test_security_regression.py:1).

Covers: SMS test-code issuance-only semantics + verify attempt caps,
account-merge source derivation (server-side verified candidate only),
presentation route ownership, framework body-size cap, Secure cookie flag,
anonymous-write blocking, and cross-user owner checks.
"""

import tempfile

import pytest

from deepvision_tpu.web.server import create_app

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


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


# ---------------------------------------------------------------------------
# License-gate matrix (reference require_valid_license web/server.py:12798,
# protected-route matcher :12841, runtime-togglable enforcement :9322-9650)
# ---------------------------------------------------------------------------

LICENSE_GATED_ROUTES = [
    ("POST", "/api/sessions", {"topic": "t", "scenario_id":
                               "product-requirement"}),
    ("POST", "/api/sessions/dv-x/next-question", {}),
    ("POST", "/api/sessions/dv-x/submit-answer", {"question": "q",
                                                  "answer": "a"}),
    ("POST", "/api/sessions/dv-x/generate-report", {}),
]


@pytest.fixture()
def licensed_app():
    tmp = tempfile.TemporaryDirectory()
    a = create_app(data_dir=tmp.name, overrides={
        "AI_MODE": "template", "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": "13800000001",
        "LICENSE_ENFORCEMENT_ENABLED": True,
    })
    a._tmp = tmp
    yield a
    a.state.shutdown()
    tmp.cleanup()


@pytest.mark.parametrize("method,path,body", LICENSE_GATED_ROUTES)
def test_license_gate_blocks_unlicensed(licensed_app, method, path, body):
    c = licensed_app.test_client()
    login(c, "13912121212")
    r = c.open(path, method=method, json_body=body)
    assert r.status_code == 403, f"{path} -> {r.status_code}"
    assert r.get_json().get("license_required") is True


def test_license_gate_admin_exempt(licensed_app):
    c = licensed_app.test_client()
    login(c, "13800000001")  # admin
    r = c.post("/api/sessions", json_body={
        "topic": "t", "scenario_id": "product-requirement"})
    assert r.status_code == 201


def test_license_gate_opens_after_activation(licensed_app):
    admin = licensed_app.test_client()
    login(admin, "13800000001")
    codes = admin.post("/api/admin/licenses/batch", json_body={
        "count": 1, "level": "standard"}).get_json()["codes"]
    c = licensed_app.test_client()
    login(c, "13913131313")
    assert c.post("/api/sessions", json_body={
        "topic": "t", "scenario_id": "product-requirement"}).status_code == 403
    assert c.post("/api/licenses/activate",
                  json_body={"code": codes[0]}).status_code == 200
    assert c.post("/api/sessions", json_body={
        "topic": "t", "scenario_id": "product-requirement"}).status_code == 201


def test_revoked_license_closes_gate(licensed_app):
    admin = licensed_app.test_client()
    login(admin, "13800000001")
    codes = admin.post("/api/admin/licenses/batch", json_body={
        "count": 1, "level": "standard"}).get_json()["codes"]
    c = licensed_app.test_client()
    login(c, "13914141414")
    c.post("/api/licenses/activate", json_body={"code": codes[0]})
    lic = c.get("/api/licenses/current").get_json()["license"]
    admin.post(f"/api/admin/licenses/{lic['license_id']}/revoke",
               json_body={})
    r = c.post("/api/sessions", json_body={
        "topic": "t", "scenario_id": "product-requirement"})
    assert r.status_code == 403


# ---------------------------------------------------------------------------
# Admin-route matrix: every /api/admin/** route refuses non-admins
# (reference test_security_regression.py admin coverage)
# ---------------------------------------------------------------------------

ADMIN_ROUTES = [
    ("GET", "/api/admin/licenses", None),
    ("GET", "/api/admin/licenses/summary", None),
    ("POST", "/api/admin/licenses/batch", {"count": 1}),
    ("POST", "/api/admin/licenses/bulk-revoke", {"license_ids": []}),
    ("POST", "/api/admin/licenses/bulk-extend", {"license_ids": []}),
    ("GET", "/api/admin/licenses/bootstrap/status", None),
    ("POST", "/api/admin/licenses/bootstrap", {}),
    ("GET", "/api/admin/license-enforcement", None),
    ("POST", "/api/admin/license-enforcement", {"enabled": True}),
    ("GET", "/api/admin/presentation-feature", None),
    ("POST", "/api/admin/presentation-feature", {"enabled": True}),
    ("GET", "/api/admin/users", None),
    ("GET", "/api/admin/usage/summary", None),
    ("GET", "/api/admin/usage/users", None),
    ("GET", "/api/admin/ownership-migrations", None),
    ("POST", "/api/admin/ownership-migrations/audit", {"from_user_id": "1"}),
    ("POST", "/api/admin/ownership-migrations/preview",
     {"from_user_id": "1", "to_user_id": "2"}),
    ("POST", "/api/admin/ownership-migrations/apply", {"preview_token": "x"}),
    ("POST", "/api/admin/ownership-migrations/rollback",
     {"operation_id": "x"}),
    ("GET", "/api/admin/config-center", None),
    ("POST", "/api/admin/config-center/save", {"updates": {}}),
    ("GET", "/api/metrics", None),
    ("POST", "/api/metrics/reset", {}),
    ("GET", "/api/summaries", None),
    ("POST", "/api/summaries/clear", {}),
]


@pytest.mark.parametrize("method,path,body", ADMIN_ROUTES)
def test_admin_routes_refuse_regular_users(client, method, path, body):
    login(client, "13915151515")  # not admin
    r = client.open(path, method=method,
                    json_body=body if body is not None else None)
    assert r.status_code == 403, f"{method} {path} -> {r.status_code}"


@pytest.mark.parametrize("method,path,body", ADMIN_ROUTES[:6])
def test_admin_routes_refuse_anonymous(client, method, path, body):
    r = client.open(path, method=method,
                    json_body=body if body is not None else None)
    assert r.status_code == 401, f"{method} {path} -> {r.status_code}"


# ---------------------------------------------------------------------------
# Report-route owner matrix: every report route 403/404s for non-owners
# ---------------------------------------------------------------------------

REPORT_ROUTES = [
    ("GET", "/api/reports/{name}", None),
    ("DELETE", "/api/reports/{name}", None),
    ("GET", "/api/reports/{name}/solution", None),
    ("POST", "/api/reports/{name}/solution/share", {}),
    ("GET", "/api/reports/{name}/exports", None),
    ("POST", "/api/reports/{name}/exports", {"format": "markdown"}),
    ("GET", "/api/reports/{name}/appendix/pdf", None),
    ("POST", "/api/reports/{name}/refly", {}),
    ("GET", "/api/reports/{name}/refly/status", None),
    ("GET", "/api/reports/{name}/presentation", None),
    ("POST", "/api/reports/{name}/presentation/abort", {}),
]


@pytest.mark.parametrize("method,path,body", REPORT_ROUTES)
def test_report_routes_enforce_ownership(app, method, path, body):
    c1 = app.test_client()
    login(c1, "13916161616")
    app.state.reports.save("sec-owned.md", "# 机密", owner_user_id="1",
                           instance_scope=app.state.instance_scope)
    c2 = app.test_client()
    login(c2, "13917171717")
    r = c2.open(path.format(name="sec-owned.md"), method=method,
                json_body=body if body is not None else None)
    assert r.status_code in (403, 404), f"{method} {path} -> {r.status_code}"


def test_batch_delete_skips_unowned_reports(app):
    app.state.reports.save("sec-b1.md", "x", owner_user_id="999",
                           instance_scope=app.state.instance_scope)
    c = app.test_client()
    login(c, "13918181818")
    r = c.post("/api/reports/batch-delete",
               json_body={"report_names": ["sec-b1.md"]})
    assert r.status_code == 200
    assert "sec-b1.md" not in r.get_json().get("deleted", ["sec-b1.md"]) or \
        not r.get_json()["deleted"]
    assert app.state.reports.load("sec-b1.md") is not None


# ---------------------------------------------------------------------------
# Instance-scope isolation (reference INSTANCE_SCOPE_KEY visibility checks
# web/server.py:16231-16287)
# ---------------------------------------------------------------------------

def test_instance_scope_isolates_reports(app):
    state = app.state
    state.reports.save("scoped-a.md", "# A", owner_user_id="1",
                       instance_scope="other-tenant")
    c = app.test_client()
    login(c, "13919191919")
    # even the owner id cannot read across scopes (404 masks existence)
    r = c.get("/api/reports/scoped-a.md")
    assert r.status_code == 404
    # and it never appears in list responses
    names = [x["report_name"] for x in c.get("/api/reports").get_json()]
    assert "scoped-a.md" not in names


def test_share_token_is_unguessable_and_scoped(app):
    c = app.test_client()
    login(c, "13920202020")
    # random tokens never resolve
    r = c.get("/api/public/solutions/not-a-real-token")
    assert r.status_code == 404


# ---------------------------------------------------------------------------
# Custom scenario ownership
# ---------------------------------------------------------------------------

def test_custom_scenario_delete_requires_owner(app):
    state = app.state
    state.scenarios.save_custom(
        {"id": "sec-scn", "name": "安全场景", "description": "隔离测试",
         "dimensions": [
             {"id": "d1", "name": "维度一", "key_aspects": ["a"]}]},
        owner_user_id="42", instance_scope=state.instance_scope)
    c = app.test_client()
    login(c, "13921212121")
    assert c.delete("/api/scenarios/custom/sec-scn").status_code == 403


# ---------------------------------------------------------------------------
# Session-cookie integrity
# ---------------------------------------------------------------------------

def test_tampered_session_cookie_rejected(app):
    c = app.test_client()
    login(c, "13922222323")
    token = c._cookies.get("dv_session", "")
    assert token
    payload, _, sig = token.rpartition(".")
    c._cookies["dv_session"] = payload + ".AAAA" + sig[4:]
    me = c.get("/api/auth/me").get_json()
    assert me["authenticated"] is False


def test_session_cookie_for_deleted_user_harmless(app):
    c = app.test_client()
    u = login(c, "13923232424")
    conn = app.state.auth.conn()
    conn.execute("DELETE FROM users WHERE user_id = ?", (u["user_id"],))
    conn.commit()
    assert c.get("/api/auth/me").get_json()["authenticated"] is False
    assert c.get("/api/sessions").status_code == 401
