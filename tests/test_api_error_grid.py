"""Malformed-input robustness grid: every mutating route x hostile body.

The reference's security-regression suite hammers each endpoint with
broken payloads (tests/test_security_regression.py); this grid does it
programmatically from the guard matrix's route inventory so every NEW
mutating route is automatically enrolled: non-dict JSON bodies, raw
garbage bytes, deep nesting, huge strings, null-byte strings, wrong
types — the server may refuse (4xx) but must NEVER 5xx, and must keep
serving afterwards.

A second grid pins method/protocol behavior: unsupported methods answer
405 (not 500), unknown API paths answer 404 JSON (not HTML), and the
request-body size cap refuses oversized payloads with 413.
"""

import json
import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

from tests.test_guard_matrix import M, PUBLIC_MUTATING

ADMIN_PHONE = "13900040009"
OWNER_PHONE = "13900040001"


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "error-grid-secret",
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "SMS_SEND_COOLDOWN_SECONDS": "0",
    })

    def login(phone):
        c = HttpClient(app)
        c.post("/api/auth/sms/send-code", json_body={"phone": phone})
        r = c.post("/api/auth/login/code",
                   json_body={"phone": phone, "code": "666666"})
        assert r.status_code == 200
        return c

    owner = login(OWNER_PHONE)
    admin = login(ADMIN_PHONE)
    owner_id = owner.get("/api/auth/me").get_json()["user"]["user_id"]
    admin.put(f"/api/admin/users/{owner_id}/level",
              json_body={"level": "professional"})
    r = owner.post("/api/sessions", json_body={
        "topic": "容错网格", "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    yield {"app": app, "owner": owner, "admin": admin, "sid": sid,
           "owner_id": owner_id}
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


def _fill(tmpl, ctx):
    return (tmpl.replace("{sid}", ctx["sid"])
            .replace("{report}", "no-such-report.md")
            .replace("{license_id}", "1")
            .replace("{uid}", str(ctx["owner_id"])))


# every mutating route from the guard matrix + the public mutating set
ALL_MUTATING = [(m, tmpl) for m, tmpl, _b, _o, _a in M] + \
    sorted(PUBLIC_MUTATING)

HOSTILE_BODIES = [
    ("list", [1, 2, 3]),
    ("string", "不是对象"),
    ("null", None),
    ("number", 42),
    ("deep", {"a": {"b": {"c": {"d": {"e": {"f": {"g": 1}}}}}}}),
    ("huge-string", {"topic": "超" * 50_000, "q": "x" * 50_000}),
    ("nul-bytes", {"topic": "a\x00b", "question": "q\x00"}),
    ("wrong-types", {"topic": 13, "session_ids": "not-a-list",
                     "count": "NaN", "enabled": "maybe",
                     "days": [1], "level": {"x": 1}}),
]


@pytest.mark.parametrize("body_name,body",
                         HOSTILE_BODIES, ids=[n for n, _ in HOSTILE_BODIES])
@pytest.mark.parametrize("method,tmpl", ALL_MUTATING,
                         ids=[f"{m} {t}" for m, t in ALL_MUTATING])
def test_hostile_body_never_500s(ctx, method, tmpl, body_name, body):
    client = ctx["admin"]  # admin passes every auth gate: the body
    #                        parser/validator is what this grid exercises
    path = _fill(tmpl, ctx)
    r = client.open(path, method=method, json_body=body)
    assert r.status_code < 500, (
        f"{method} {tmpl} 500s on {body_name} body: {r.text[:200]}")


@pytest.mark.parametrize("method,tmpl", ALL_MUTATING[:20],
                         ids=[f"{m} {t}" for m, t in ALL_MUTATING[:20]])
def test_raw_garbage_bytes_never_500(ctx, method, tmpl):
    path = _fill(tmpl, ctx)
    r = ctx["admin"].open(path, method=method, data=b"\xff\xfe{{{%%%",
                          headers={"Content-Type": "application/json"})
    assert r.status_code < 500, (method, tmpl, r.status_code)


def test_server_still_alive_after_the_grid(ctx):
    # robustness means the process still serves NORMAL traffic afterwards
    r = ctx["owner"].get("/api/sessions")
    assert r.status_code == 200


# ---------------------------------------------------------------------------
# protocol grid
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path", [
    "/api/sessions", "/api/reports", "/api/scenarios",
])
def test_unsupported_method_is_405(ctx, path):
    r = ctx["owner"].open(path, method="PATCH", json_body={})
    assert r.status_code == 405, (path, r.status_code)


def test_unknown_api_path_is_json_404(ctx):
    r = ctx["owner"].get("/api/definitely/not/a/route")
    assert r.status_code == 404
    assert "error" in (r.get_json() or {})


def test_oversized_body_is_413(ctx):
    blob = json.dumps({"topic": "x" * (33 * 1024 * 1024)})
    r = ctx["owner"].open("/api/sessions", method="POST",
                          data=blob.encode(),
                          headers={"Content-Type": "application/json"})
    assert r.status_code == 413, r.status_code
