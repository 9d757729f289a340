"""Security hardening depth pass (round 4) — attack-shaped inputs over
the live route surface, extending test_security_regression.py toward the
reference suite's breadth (tests/test_security_regression.py, 5.9k LoC):
path traversal, IDOR sweeps over derived resources, header/content
injection via stored names, abuse-shaped bodies, rate caps, and
privilege-escalation attempts.
"""

import json
import tempfile

import pytest

from deepvision_tpu.web.server import create_app

# NOT in the smoke tier: the IDOR/report flows here cost ~40s — the
# invariant gate (scripts/agent_guardrails.py) and the full suite run it
ADMIN_PHONE = "13800000001"


@pytest.fixture()
def app():
    tmp = tempfile.TemporaryDirectory()
    a = create_app(data_dir=tmp.name, overrides={
        "AI_MODE": "template", "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "SMS_SEND_COOLDOWN_SECONDS": 0, "SMS_DAILY_CAP": 1000,
    })
    a._tmp = tmp
    yield a
    a.state.shutdown()
    tmp.cleanup()


@pytest.fixture()
def client(app):
    return app.test_client()


def login(client, phone="13900000001"):
    client.post("/api/auth/sms/send-code", json_body={"phone": phone})
    r = client.post("/api/auth/login/code",
                    json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return r.get_json()["user"]


def make_report(client):
    r = client.post("/api/sessions", json_body={
        "topic": "安全加固验证", "scenario_id": "product-requirement",
        "interview_mode": "quick"})
    sid = r.get_json()["session_id"]
    q = client.post(f"/api/sessions/{sid}/next-question",
                    json_body={}).get_json()
    client.post(f"/api/sessions/{sid}/submit-answer", json_body={
        "question": q["question"], "answer": "统一数据口径，因为口径不一致",
        "dimension": q.get("dimension")})
    r = client.post(f"/api/sessions/{sid}/generate-report",
                    json_body={"force": True})
    assert r.status_code == 202
    client.app.state.report_queue.drain()
    status = client.get(f"/api/status/report-generation/{sid}").get_json()
    return sid, status["report_name"]


# ---------------------------------------------------------------------------
# Path traversal
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path", [
    "/../etc/passwd",
    "/%2e%2e/%2e%2e/etc/passwd",
    "/css/../../../../etc/passwd",
    "/js/..%2f..%2fetc%2fpasswd",
])
def test_static_route_blocks_traversal(client, path):
    r = client.get(path)
    assert r.status_code in (400, 404), (path, r.status_code)
    assert b"root:" not in r.data


@pytest.mark.parametrize("name", [
    "../../auth.sqlite3",
    "..%2F..%2Fmeta.sqlite3",
    "/etc/passwd",
    "....//....//secrets",
])
def test_report_routes_block_traversal_names(client, name):
    login(client)
    for path in (f"/api/reports/{name}",
                 f"/api/reports/{name}/solution",
                 f"/api/reports/{name}/appendix/pdf"):
        r = client.get(path)
        assert r.status_code in (400, 403, 404), (path, r.status_code)


def test_document_name_traversal_blocked(client):
    login(client)
    r = client.post("/api/sessions", json_body={
        "topic": "t", "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    r = client.get(f"/api/sessions/{sid}/documents/..%2F..%2Fsecrets.txt")
    # 405: the documents item route is DELETE-only, and since round 5 the
    # static catch-all no longer swallows GET /api/* (the router answers
    # method-not-allowed instead of the file server's 404) — either way
    # no file content is reachable
    assert r.status_code in (400, 404, 405)
    r = client.open(
        f"/api/sessions/{sid}/documents/..%2F..%2Fsecrets.txt",
        method="DELETE")
    assert r.status_code in (400, 404)


# ---------------------------------------------------------------------------
# IDOR sweep over derived resources
# ---------------------------------------------------------------------------

def test_idor_sweep_derived_resources(app):
    """Every derived artifact of user A's report must refuse user B —
    not just the report body (parametrized sweep over the read surface
    the earlier suite did not cover)."""
    c1 = app.test_client()
    login(c1, "13900000001")
    sid, report = make_report(c1)

    c2 = app.test_client()
    login(c2, "13900000002")
    for method, path in [
        ("GET", f"/api/reports/{report}"),
        ("GET", f"/api/reports/{report}/solution"),
        ("GET", f"/api/reports/{report}/exports"),
        ("POST", f"/api/reports/{report}/exports"),
        ("GET", f"/api/reports/{report}/appendix/pdf"),
        ("GET", f"/api/reports/{report}/presentation/status"),
        ("DELETE", f"/api/reports/{report}"),
        ("GET", f"/api/sessions/{sid}"),
        ("POST", f"/api/sessions/{sid}/next-question"),
        ("POST", f"/api/sessions/{sid}/submit-answer"),
        ("POST", f"/api/sessions/{sid}/restart-interview"),
        ("POST", f"/api/sessions/{sid}/generate-report"),
        ("GET", f"/api/sessions/{sid}/report-readiness"),
        ("POST", f"/api/sessions/{sid}/interview-assistant-chat"),
    ]:
        r = c2.open(path, method=method, json_body={})
        assert r.status_code in (403, 404), (method, path, r.status_code)
    # and the owner still has access afterwards (no destructive leak)
    assert c1.get(f"/api/reports/{report}").status_code == 200


def test_export_asset_ids_not_cross_report(app):
    """An export asset minted for report A must not be fetchable through
    report B's asset route (asset ids are scoped to their report)."""
    c1 = app.test_client()
    login(c1, "13900000001")
    _, report_a = make_report(c1)
    _, report_b = make_report(c1)
    asset = c1.post(f"/api/reports/{report_a}/exports",
                    json_body={"format": "markdown"}).get_json()["asset_id"]
    ok = c1.get(f"/api/reports/{report_a}/exports/{asset}")
    assert ok.status_code == 200
    crossed = c1.get(f"/api/reports/{report_b}/exports/{asset}")
    assert crossed.status_code == 404, crossed.status_code


# ---------------------------------------------------------------------------
# Injection-shaped stored values
# ---------------------------------------------------------------------------

def test_sql_shaped_topic_round_trips_inert(client):
    login(client)
    evil = "需求'); DROP TABLE session_index;--"
    r = client.post("/api/sessions", json_body={
        "topic": evil, "scenario_id": "product-requirement"})
    assert r.status_code == 201
    sid = r.get_json()["session_id"]
    # listing still works and the topic round-trips verbatim
    rows = client.get("/api/sessions").get_json()
    assert any(s["session_id"] == sid for s in rows)
    assert client.get(f"/api/sessions/{sid}").get_json()["topic"] == evil


def test_header_injection_via_export_filename(client):
    login(client)
    _, report = make_report(client)
    r = client.post(f"/api/reports/{report}/exports", json_body={
        "format": "archive", "filename": 'evil"\r\nSet-Cookie: pwn=1',
        "content_base64": "aGk=",
    })
    # regardless of acceptance, no injected header may appear
    assert "Set-Cookie" not in str(r.headers.get("Content-Disposition", ""))
    for k in r.headers:
        assert "pwn" not in str(r.headers[k])


def test_script_shaped_topic_survives_as_data(client):
    login(client)
    evil = "<script>alert(1)</script>需求调研"
    r = client.post("/api/sessions", json_body={
        "topic": evil, "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    got = client.get(f"/api/sessions/{sid}")
    # API responses are JSON; the literal must come back as data
    assert got.get_json()["topic"] == evil
    assert got.headers.get("Content-Type", "").startswith("application/json")


# ---------------------------------------------------------------------------
# Abuse-shaped bodies + caps
# ---------------------------------------------------------------------------

def test_malformed_json_bodies_do_not_5xx(client):
    login(client)
    for raw in (b"{", b"null", b"[]", b'"str"', b"\xff\xfe\x00"):
        r = client.open("/api/sessions", method="POST", data=raw,
                        headers={"Content-Type": "application/json"})
        assert r.status_code < 500, (raw, r.status_code)


def test_pagination_params_clamped_and_inert(client):
    login(client)
    for q in ("page=-1&page_size=99999", "page=abc&page_size=xyz",
              "page=1&page_size=0"):
        r = client.get(f"/api/sessions?{q}")
        assert r.status_code == 200, (q, r.status_code)


def test_sms_daily_cap_enforced():
    tmp = tempfile.TemporaryDirectory()
    try:
        a = create_app(data_dir=tmp.name, overrides={
            "AI_MODE": "template", "SMS_PROVIDER": "mock",
            "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
            "SMS_SEND_COOLDOWN_SECONDS": 0, "SMS_DAILY_CAP": 3,
        })
        c = a.test_client()
        for i in range(3):
            assert c.post("/api/auth/sms/send-code",
                          json_body={"phone": "13900000077"}
                          ).status_code == 200
        r = c.post("/api/auth/sms/send-code",
                   json_body={"phone": "13900000077"})
        assert r.status_code == 429, r.status_code
        a.state.shutdown()
    finally:
        tmp.cleanup()


def test_scenario_generation_rejects_oversized_description(client):
    user = login(client)
    # custom scenarios need standard level; elevate first so the size
    # check (not the capability gate) is what fires
    login(client, ADMIN_PHONE)
    client.put(f"/api/admin/users/{user['user_id']}/level",
               json_body={"level": "standard"})
    login(client)
    r = client.post("/api/scenarios/generate", json_body={
        "description": "超长" * 100000})
    assert r.status_code in (400, 413), r.status_code


# ---------------------------------------------------------------------------
# Privilege escalation
# ---------------------------------------------------------------------------

def test_level_self_promotion_blocked(client):
    user = login(client)
    r = client.put(f"/api/admin/users/{user['user_id']}/level",
                   json_body={"level": "professional"})
    assert r.status_code in (403, 404)
    assert login(client)["level"] == "experience"


@pytest.mark.parametrize("method,path,body", [
    ("POST", "/api/admin/licenses/batch", {"count": 1}),
    ("POST", "/api/admin/licenses/bulk-revoke", {"license_ids": [1]}),
    ("POST", "/api/admin/ownership-migrations/audit", {}),
    ("POST", "/api/admin/ownership-migrations/apply", {}),
    ("POST", "/api/admin/license-enforcement", {"enabled": True}),
    ("GET", "/api/admin/usage/summary", None),
])
def test_admin_surface_rejects_standard_users(client, method, path, body):
    login(client)
    r = client.open(path, method=method, json_body=body)
    assert r.status_code in (403, 404), (path, r.status_code)


def test_admin_level_change_audited_in_usage(client):
    """Admin actions must leave a consistent trail: the level change is
    visible through the admin users listing afterwards."""
    user = login(client, "13900000005")
    login(client, ADMIN_PHONE)
    r = client.put(f"/api/admin/users/{user['user_id']}/level",
                   json_body={"level": "standard"})
    assert r.status_code == 200
    rows = client.get("/api/admin/users?q=13900000005").get_json()
    users = rows if isinstance(rows, list) else rows.get("users", [])
    byid = {u["user_id"]: u for u in users}
    assert byid[user["user_id"]]["level"] == "standard"
