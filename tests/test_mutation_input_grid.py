"""Malformed-input grid over EVERY mutating route (VERDICT r4 #5).

The guard matrix (tests/test_guard_matrix.py) proves each mutating route
refuses the wrong CALLER; this grid proves each one survives the wrong
BODY.  Every route in the live route table that accepts POST/PUT/DELETE
is hammered, as its legitimate caller class, with the malformed-payload
corpus the reference's security suite applies by hand
(/root/reference/tests/test_security_regression.py:1 — non-dict JSON,
nulls, wrong types, oversized fields, deep nesting, raw bytes labeled
JSON), and must never 5xx: malformed input is a client error, not a
server crash.  A second sweep replays the worst payload anonymously and
asserts the auth refusal still happens BEFORE body handling on every
protected route (a parse error must never pre-empt the 401).

Routes are enumerated from ``app._routes`` at run time — a new mutating
route is automatically in the grid the day it ships.
"""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800009001"
OWNER_PHONE = "13900009001"
OTHER_PHONE = "13900009002"
SPARE_PHONE = "13900009003"


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "input-grid-secret",
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "SMS_SEND_COOLDOWN_SECONDS": "0",
    })

    def login(phone):
        c = HttpClient(app)
        c.post("/api/auth/sms/send-code", json_body={"phone": phone})
        r = c.post("/api/auth/login/code",
                   json_body={"phone": phone, "code": "666666"})
        assert r.status_code == 200, r.text
        return c

    owner = login(OWNER_PHONE)
    other = login(OTHER_PHONE)
    admin = login(ADMIN_PHONE)

    owner_id = owner.get("/api/auth/me").get_json()["user"]["user_id"]
    other_id = other.get("/api/auth/me").get_json()["user"]["user_id"]
    r = admin.put(f"/api/admin/users/{owner_id}/level",
                  json_body={"level": "professional"})
    assert r.status_code == 200, r.text

    # a "punching-bag" session absorbs whatever state the malformed-body
    # sweeps manage to write; the report fixture stays clean
    r = owner.post("/api/sessions", json_body={
        "topic": "输入网格访谈", "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    q = owner.post(f"/api/sessions/{sid}/next-question",
                   json_body={}).get_json()
    owner.post(f"/api/sessions/{sid}/submit-answer", json_body={
        "question": q["question"], "answer": "预算两百万，分两期投入",
        "dimension": q.get("dimension"), "options": q.get("options")})
    r = owner.post(f"/api/sessions/{sid}/generate-report",
                   json_body={"force": True})
    assert r.status_code == 202, r.text
    app.state.report_queue.drain()
    st = owner.get(f"/api/status/report-generation/{sid}").get_json()
    assert st["state"] == "completed", st
    report = st["report_name"]
    admin.post("/api/admin/licenses/batch",
               json_body={"count": 1, "level": "standard"})
    license_id = admin.get("/api/admin/licenses").get_json()[0]["license_id"]

    yield {
        "app": app, "owner": owner, "other": other, "admin": admin,
        "login": login, "sid": sid, "report": report,
        "owner_id": owner_id, "other_id": other_id,
        "license_id": license_id,
    }
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


def mutating_routes(app):
    out = []
    for _r, methods, _f, rule in app._routes:
        for m in sorted(set(methods) - {"GET", "HEAD", "OPTIONS"}):
            out.append((m, rule))
    return sorted(set(out))


def _fill(rule, ctx):
    return (rule
            .replace("<session_id>", ctx["sid"])
            .replace("<path:filename>", ctx["report"])
            .replace("<path:doc_name>", "no-such-doc.docx")
            .replace("<scenario_id>", "no-such-scenario")
            .replace("<int:license_id>", str(ctx["license_id"]))
            .replace("<int:user_id>", str(ctx["other_id"])))


# auth bootstrap routes a logged-out client legitimately POSTs to
PUBLIC_MUTATING = {
    "/api/auth/login", "/api/auth/login/code", "/api/auth/register",
    "/api/auth/sms/send-code", "/api/auth/recover/login",
    "/api/auth/recover/send-code", "/api/auth/logout",
}
# destructive on the CALLER's own cookie/session — use a throwaway login
CALLER_DESTRUCTIVE = {"/api/auth/logout", "/api/auth/account-merge/apply"}


def _caller(m, rule, ctx, fresh):
    if rule.startswith("/api/admin") or rule in (
            "/api/metrics/reset", "/api/summaries/clear"):
        return ctx["admin"]
    if rule in PUBLIC_MUTATING:
        return HttpClient(ctx["app"])
    if rule in CALLER_DESTRUCTIVE or rule.startswith("/api/auth/"):
        return fresh
    # resource DELETEs run against a missing resource (the malformed-body
    # contract — "no 5xx" — must hold there too, and fixture state stays)
    return ctx["owner"]


MALFORMED = [
    ("array", [1, 2, 3]),
    ("string", "不是对象"),
    ("number", 12345),
    ("nulls", {"topic": None, "question": None, "answer": None,
               "session_ids": None, "level": None, "count": None,
               "enabled": None, "format": None, "code": None}),
    ("wrong_types", {"topic": 123, "question": {"a": 1}, "answer": [],
                     "session_ids": "not-a-list", "level": 7,
                     "count": "many", "enabled": "yes", "format": {},
                     "code": [1], "phone": {"n": 1}, "force": "x",
                     "dimension": 9, "options": "abc", "days": [],
                     "license_ids": 3, "user_id": "x"}),
    ("oversized", {"topic": "超" * 20000, "answer": "A" * 60000,
                   "description": "长" * 60000, "question": "q" * 40000}),
    ("deep_nesting", {"topic": [[[[[[[[[[[[[[[[[[[[["x"]]]]]]]]]]]]]]]]]]]]]}),
]


@pytest.fixture(scope="module")
def routes(ctx):
    return mutating_routes(ctx["app"])


def test_grid_is_nonempty_and_current(ctx, routes):
    # the grid tracks the live table; a route count collapse means the
    # enumeration broke, not that the app got smaller
    assert len(routes) >= 50, routes


@pytest.mark.parametrize("name,payload", MALFORMED)
def test_malformed_bodies_never_5xx(ctx, routes, name, payload):
    fresh = ctx["login"](SPARE_PHONE)
    failures = []
    for m, rule in routes:
        path = _fill(rule, ctx)
        c = _caller(m, rule, ctx, fresh)
        r = c.open(path, method=m, json_body=payload)
        if r.status_code >= 500:
            failures.append((m, rule, name, r.status_code))
    assert not failures, failures


def test_raw_bytes_labeled_json_never_5xx(ctx, routes):
    fresh = ctx["login"](SPARE_PHONE)
    garbage = b"\xff\xfe{not json\x00"
    failures = []
    for m, rule in routes:
        path = _fill(rule, ctx)
        c = _caller(m, rule, ctx, fresh)
        r = c.open(path, method=m, data=garbage,
                   headers={"Content-Type": "application/json"})
        if r.status_code >= 500:
            failures.append((m, rule, r.status_code))
    assert not failures, failures


def test_truncated_json_never_5xx(ctx, routes):
    fresh = ctx["login"](SPARE_PHONE)
    failures = []
    for m, rule in routes:
        path = _fill(rule, ctx)
        c = _caller(m, rule, ctx, fresh)
        r = c.open(path, method=m, data=b'{"topic": "cut',
                   headers={"Content-Type": "application/json"})
        if r.status_code >= 500:
            failures.append((m, rule, r.status_code))
    assert not failures, failures


def test_protected_routes_refuse_anon_even_with_malformed_body(ctx, routes):
    """Auth must be decided before the body is interpreted: a malformed
    payload on a protected route still yields the 401/403 family, never
    a 2xx and never a 5xx."""
    anon = HttpClient(ctx["app"])
    failures = []
    for m, rule in routes:
        if rule in PUBLIC_MUTATING:
            continue
        path = _fill(rule, ctx)
        r = anon.open(path, method=m, json_body=[1, 2, 3])
        if r.status_code >= 500 or 200 <= r.status_code < 300:
            failures.append((m, rule, r.status_code))
    assert not failures, failures


def test_wrong_content_type_never_5xx(ctx, routes):
    """A JSON body mislabeled text/plain: routes may refuse it (4xx) or
    tolerate it, but must not crash parsing."""
    fresh = ctx["login"](SPARE_PHONE)
    failures = []
    for m, rule in routes:
        path = _fill(rule, ctx)
        c = _caller(m, rule, ctx, fresh)
        r = c.open(path, method=m, data=b'{"topic": "t"}',
                   headers={"Content-Type": "text/plain"})
        if r.status_code >= 500:
            failures.append((m, rule, r.status_code))
    assert not failures, failures
