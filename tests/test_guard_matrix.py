"""Per-route security guard matrix (VERDICT r2 #10; reference
test_security_regression.py:1 concentrates its 5,964 LoC here).

Every MUTATING route in the app's live route table is classified:
either it appears in the matrix below with its expected behavior for
  anonymous   (no cookie)          -> 401
  other-user  (logged in, not the resource owner) -> 403/404
  non-admin   (admin-only routes)  -> 403
or it is explicitly allowlisted as public/auth-bootstrap. A new
mutating route that nobody classifies FAILS the completeness test —
routes cannot silently ship without a guard decision.

A second matrix drives the license-enforcement gate: with enforcement
on, unlicensed users are refused on the gated business routes and pass
again after activating a license."""

import os
import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke

ADMIN_PHONE = "13800000001"
OWNER_PHONE = "13900001001"
OTHER_PHONE = "13900001002"


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "guard-matrix-secret",
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
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
    anon = HttpClient(app)

    # custom scenarios are level-gated; raise the owner to professional
    owner_id = owner.get("/api/auth/me").get_json()["user"]["user_id"]
    r = admin.put(f"/api/admin/users/{owner_id}/level",
                  json_body={"level": "professional"})
    assert r.status_code == 200, r.text
    # level is read from the DB per request — no re-login needed

    # owner's resources the matrix paths point at
    r = owner.post("/api/sessions", json_body={
        "topic": "守卫矩阵访谈", "scenario_id": "product-requirement"})
    session_id = r.get_json()["session_id"]
    q = owner.post(f"/api/sessions/{session_id}/next-question",
                   json_body={}).get_json()
    owner.post(f"/api/sessions/{session_id}/submit-answer", json_body={
        "question": q["question"], "answer": "预算两百万，因为分两期投入",
        "dimension": q.get("dimension"), "options": q.get("options")})
    r = owner.post(f"/api/sessions/{session_id}/generate-report",
                   json_body={"force": True})
    assert r.status_code == 202, r.text
    app.state.report_queue.drain()
    st = owner.get(
        f"/api/status/report-generation/{session_id}").get_json()
    assert st["state"] == "completed", st
    report_name = st["report_name"]
    r = owner.post("/api/scenarios/custom", json_body={
        "id": "guard-custom", "name": "守卫场景",
        "description": "守卫矩阵用的自定义场景",
        "dimensions": [{"id": "d1", "name": "维度一",
                        "key_aspects": ["要点"]}]})
    assert r.status_code in (200, 201), r.text
    lic = admin.post("/api/admin/licenses/batch",
                     json_body={"count": 1, "level": "standard"})
    license_code = lic.get_json()["codes"][0]
    license_id = admin.get("/api/admin/licenses").get_json()[0]["license_id"]

    yield {
        "app": app, "anon": anon, "owner": owner, "other": other,
        "admin": admin, "session_id": session_id,
        "report_name": report_name, "license_code": license_code,
        "owner_id": owner_id,
        "license_id": license_id, "login": login, "tmp": tmp,
    }
    app.state.report_queue.shutdown()
    tmp.cleanup()


# ---------------------------------------------------------------------------
# the matrix
# ---------------------------------------------------------------------------
# (method, path-template, body, other-user expectation, admin_only)
# path templates take {sid} / {report}; other=None means the route is
# not owner-scoped (e.g. operates on the caller's own account).

M = [
    # sessions
    ("POST", "/api/sessions", {"topic": "x"}, None, False),
    ("PUT", "/api/sessions/{sid}", {"topic": "y"}, (403, 404), False),
    ("DELETE", "/api/sessions/{sid}", None, (403, 404), False),
    ("POST", "/api/sessions/batch-delete",
     {"session_ids": ["{sid}"]}, "noop", False),
    ("POST", "/api/sessions/{sid}/next-question", {}, (403, 404), False),
    ("POST", "/api/sessions/{sid}/submit-answer",
     {"question": "q", "answer": "a"}, (403, 404), False),
    ("POST", "/api/sessions/{sid}/undo-answer", {}, (403, 404), False),
    ("POST", "/api/sessions/{sid}/skip-follow-up", {}, (403, 404), False),
    ("POST", "/api/sessions/{sid}/complete-dimension",
     {"dimension": "d1"}, (403, 404), False),
    ("POST", "/api/sessions/{sid}/restart-interview", {},
     (403, 404), False),
    ("POST", "/api/sessions/{sid}/documents", None, (403, 404), False),
    ("DELETE", "/api/sessions/{sid}/documents/some.docx", None,
     (403, 404), False),
    ("POST", "/api/sessions/{sid}/interview-assistant-chat",
     {"message": "hi"}, (403, 404), False),
    ("POST", "/api/sessions/{sid}/generate-report", {"force": True},
     (403, 404), False),
    ("POST", "/api/sessions/{sid}/report-readiness", {},
     (403, 404), False),
    # reports
    ("DELETE", "/api/reports/{report}", None, (403, 404), False),
    ("POST", "/api/reports/batch-delete",
     {"report_names": ["{report}"]}, "noop", False),
    ("POST", "/api/reports/{report}/exports", {"format": "docx"},
     (403, 404), False),
    ("POST", "/api/reports/{report}/solution/share", {},
     (403, 404), False),
    ("POST", "/api/reports/{report}/refly", {}, (403, 404), False),
    ("POST", "/api/reports/{report}/presentation/abort", {},
     (403, 404), False),
    # scenarios / templates
    ("POST", "/api/scenarios/generate", {"description": "x"},
     None, False),
    ("POST", "/api/scenarios/custom",
     {"id": "m-x", "name": "n", "description": "d",
      "dimensions": []}, None, False),
    ("DELETE", "/api/scenarios/custom/guard-custom", None,
     "scenario", False),
    ("POST", "/api/scenarios/recognize", {"text": "x"}, None, False),
    ("POST", "/api/report-templates/validate", {"template": {}},
     None, False),
    ("POST", "/api/report-templates/preview", {"template": {}},
     None, False),
    # account-level
    ("POST", "/api/licenses/activate", {"code": "XXXX"}, None, False),
    ("POST", "/api/auth/bind/phone", {"phone": "139", "code": "1"},
     None, False),
    ("POST", "/api/auth/account-merge/preview", {}, None, False),
    ("POST", "/api/auth/account-merge/apply", {"token": "x"},
     None, False),
    # admin
    ("POST", "/api/admin/licenses/batch", {"count": 1}, None, True),
    ("POST", "/api/admin/licenses/bootstrap", {}, None, True),
    ("POST", "/api/admin/license-enforcement", {"enabled": False},
     None, True),
    ("POST", "/api/admin/license-enforcement/follow-default", {},
     None, True),
    ("POST", "/api/admin/presentation-feature", {"enabled": False},
     None, True),
    ("POST", "/api/admin/presentation-feature/follow-default", {},
     None, True),
    ("POST", "/api/admin/licenses/bulk-revoke", {"license_ids": []},
     None, True),
    ("POST", "/api/admin/licenses/bulk-extend",
     {"license_ids": [], "days": 1}, None, True),
    ("POST", "/api/admin/licenses/{license_id}/revoke", {}, None, True),
    ("POST", "/api/admin/licenses/{license_id}/extend", {"days": 1},
     None, True),
    ("PUT", "/api/admin/users/{uid}/level", {"level": "standard"},
     None, True),
    ("POST", "/api/admin/ownership-migrations/audit", {"user_id": "1"},
     None, True),
    ("POST", "/api/admin/ownership-migrations/preview",
     {"from_user_id": "1", "to_user_id": "2"}, None, True),
    ("POST", "/api/admin/ownership-migrations/apply",
     {"token": "x", "confirm_word": "x"}, None, True),
    ("POST", "/api/admin/ownership-migrations/rollback",
     {"backup": "x"}, None, True),
    ("POST", "/api/admin/config-center/save", {"values": {}},
     None, True),
    ("POST", "/api/admin/config-center/site-config", {}, None, True),
    ("POST", "/api/metrics/reset", {}, None, True),
    ("POST", "/api/summaries/clear", {}, None, True),
]

# auth-bootstrap and public mutating routes with their own semantics
PUBLIC_MUTATING = {
    ("POST", "/api/auth/sms/send-code"),
    ("POST", "/api/auth/login/code"),
    ("POST", "/api/auth/recover/login"),
    ("POST", "/api/auth/recover/send-code"),
    ("POST", "/api/auth/register"),
    ("POST", "/api/auth/login"),
    ("POST", "/api/auth/logout"),
}


def _path(tmpl, ctx):
    return tmpl.replace("{sid}", ctx["session_id"]) \
        .replace("{report}", ctx["report_name"]) \
        .replace("{license_id}", str(ctx["license_id"])) \
        .replace("{uid}", str(ctx["owner_id"]))


def _body(body, ctx):
    if body is None:
        return None
    out = {}
    for k, v in body.items():
        if isinstance(v, list):
            out[k] = [_path(x, ctx) if isinstance(x, str) else x
                      for x in v]
        elif isinstance(v, str):
            out[k] = _path(v, ctx)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# completeness: every mutating route is classified
# ---------------------------------------------------------------------------

def test_every_mutating_route_is_classified(ctx):
    classified = {(m, tmpl.replace("{sid}", "<session_id>")
                   .replace("{report}", "<path:filename>")
                   .replace("{license_id}", "<int:license_id>"))
                  for m, tmpl, *_ in M}
    missing = []
    for regex, methods, fn, rule in ctx["app"]._routes:
        for method in methods:
            if method in ("GET", "HEAD", "OPTIONS"):
                continue
            key = (method, rule)
            if key in PUBLIC_MUTATING:
                continue
            norm = rule.replace("<session_id>", "<session_id>")
            hit = any(
                m == method and _same_rule(tmpl, rule)
                for m, tmpl, *_ in M)
            if not hit:
                missing.append(key)
    assert not missing, (
        f"mutating routes without a guard-matrix entry: {missing} — "
        f"add them to M or PUBLIC_MUTATING with an explicit decision")


def _same_rule(tmpl, rule):
    """matrix template ~ route rule (placeholder-insensitive)."""
    import re
    t = tmpl.replace("{sid}", "@").replace("{report}", "@") \
        .replace("{license_id}", "@").replace("{uid}", "@")
    t = re.sub(r"/some\.docx$", "/@", t)
    t = re.sub(r"/guard-custom$", "/@", t)
    r = re.sub(r"<[^>]+>", "@", rule)
    return t == r


# ---------------------------------------------------------------------------
# anonymous: every classified route refuses without a cookie
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method,tmpl,body,other,admin_only", M)
def test_anonymous_refused(ctx, method, tmpl, body, other, admin_only):
    r = ctx["anon"].open(_path(tmpl, ctx), method=method,
                         json_body=_body(body, ctx))
    assert r.status_code == 401, (method, tmpl, r.status_code, r.text)


# ---------------------------------------------------------------------------
# other user: owner-scoped routes refuse or hide the resource
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "method,tmpl,body,other,admin_only",
    [row for row in M if row[3] not in (None,) and not row[4]])
def test_other_user_cannot_touch_owned_resources(ctx, method, tmpl, body,
                                                 other, admin_only):
    r = ctx["other"].open(_path(tmpl, ctx), method=method,
                          json_body=_body(body, ctx))
    if other == "noop":
        # batch routes silently skip foreign ids — they must not delete
        assert r.status_code in (200, 207), (tmpl, r.status_code)
        assert ctx["owner"].get(
            f"/api/sessions/{ctx['session_id']}").status_code == 200
        assert ctx["owner"].get(
            f"/api/reports/{ctx['report_name']}").status_code == 200
    elif other == "scenario":
        # another user's custom scenario is not theirs to delete
        assert r.status_code in (403, 404), (tmpl, r.status_code, r.text)
    else:
        assert r.status_code in other, (tmpl, r.status_code, r.text)


# ---------------------------------------------------------------------------
# non-admin on admin routes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "method,tmpl,body,other,admin_only",
    [row for row in M if row[4]])
def test_non_admin_refused_on_admin_routes(ctx, method, tmpl, body, other,
                                           admin_only):
    r = ctx["other"].open(_path(tmpl, ctx), method=method,
                          json_body=_body(body, ctx))
    assert r.status_code == 403, (method, tmpl, r.status_code, r.text)


# ---------------------------------------------------------------------------
# license enforcement gate
# ---------------------------------------------------------------------------

LICENSE_GATED = [
    ("POST", "/api/sessions", {"topic": "gated"}),
    ("POST", "/api/sessions/{sid}/next-question", {}),
    ("POST", "/api/sessions/{sid}/submit-answer",
     {"question": "q", "answer": "a"}),
    ("POST", "/api/sessions/{sid}/generate-report", {"force": True}),
]


def test_license_enforcement_gate_cycle(ctx):
    admin, owner = ctx["admin"], ctx["owner"]
    r = admin.post("/api/admin/license-enforcement",
                   json_body={"enabled": True})
    assert r.status_code == 200, r.text
    try:
        for method, tmpl, body in LICENSE_GATED:
            r = owner.open(_path(tmpl, ctx), method=method,
                           json_body=_body(body, ctx))
            assert r.status_code == 403, (tmpl, r.status_code, r.text)
            assert r.get_json().get("license_required") is True, tmpl
        # admin bypasses the gate
        r = admin.post("/api/sessions", json_body={
            "topic": "管理员直通", "scenario_id": "product-requirement"})
        assert r.status_code == 201, r.text
        # activation restores access
        r = owner.post("/api/licenses/activate",
                       json_body={"code": ctx["license_code"]})
        assert r.status_code == 200, r.text
        r = owner.post("/api/sessions", json_body={
            "topic": "激活后恢复", "scenario_id": "product-requirement"})
        assert r.status_code == 201, r.text
    finally:
        admin.post("/api/admin/license-enforcement",
                   json_body={"enabled": False})
