"""Programmatic route x actor x level grid (VERDICT r4 #5).

The guard matrix (tests/test_guard_matrix.py) classifies every MUTATING
route.  This suite closes the other half of the surface the same way:

* every GET route in the LIVE route table is classified into an access
  class — ``public``, ``authed`` (any logged-in account), ``owner``
  (resource owner only), ``token`` (capability URL / unguessable id),
  ``admin`` — and a completeness test FAILS when a new GET route ships
  unclassified;
* the access expectation is then ENFORCED for the full actor grid
  (anonymous / other-user / non-admin / owner / admin) — enumerated
  from the classification, not sampled;
* every capability-gated feature route is crossed with ALL THREE user
  levels, with the expected verdict DERIVED from web/levels.py's
  capability matrix — the server must enforce exactly what the matrix
  declares, for every level, not just the ones a journey happened to
  use.

Reference: tests/test_api_comprehensive.py (6.5k LoC) enumerates the
same classes by hand; here the app's own route table drives the grid.
"""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.levels import LEVELS, level_allows
from deepvision_tpu.web.server import create_app

OWNER_PHONE = "13900020001"
OTHER_PHONE = "13900020002"
ADMIN_PHONE = "13900020009"


# ---------------------------------------------------------------------------
# GET-route classification (rule template -> access class)
# ---------------------------------------------------------------------------

PUBLIC = "public"      # 200 for anonymous
AUTHED = "authed"      # 401/302 anon; 200 any account
OWNER = "owner"        # 401 anon; 403/404 other; 200 owner
TOKEN = "token"        # reachable by unguessable token/id alone
ADMIN = "admin"        # 403 non-admin; 200 admin
STATIC = "static"      # static file plumbing; smoke-checked only
EXTERNAL = "external"  # depends on unconfigured external IdP (WeChat):
#                        never an auth refusal, never a 5xx

GET_CLASSES = {
    "/": STATIC,
    "/<static:filename>": STATIC,
    "/site-config.js": PUBLIC,
    "/api/status": PUBLIC,
    "/api/status/web-search": PUBLIC,
    # status pollers are deliberately keyed by the unguessable session id
    # (the interview page polls before auth cookies settle; payload is
    # state + report name only)
    "/api/status/thinking/<session_id>": TOKEN,
    "/api/status/report-generation/<session_id>": TOKEN,
    "/api/public/solutions/<share_token>": TOKEN,
    # /api/auth/me serves the anonymous identity payload too (the shell
    # bootstraps from it before login)
    "/api/auth/me": PUBLIC,
    "/api/scenarios": AUTHED,
    "/api/scenarios/<scenario_id>": AUTHED,
    "/api/auth/wechat/start": EXTERNAL,
    "/api/auth/wechat/callback": EXTERNAL,
    "/api/auth/bind/status": AUTHED,
    "/api/auth/bind/wechat/start": EXTERNAL,
    "/api/licenses/current": AUTHED,
    "/api/sessions": AUTHED,          # list: own records only (see below)
    "/api/reports": AUTHED,
    "/api/sessions/<session_id>": OWNER,
    "/api/sessions/<session_id>/report-readiness": OWNER,
    "/api/reports/<path:filename>": OWNER,
    "/api/reports/<path:filename>/appendix/pdf": OWNER,
    "/api/reports/<path:filename>/exports": OWNER,
    "/api/reports/<path:filename>/exports/<asset_id>": OWNER,
    "/api/reports/<path:filename>/presentation": OWNER,
    "/api/reports/<path:filename>/presentation/link": OWNER,
    "/api/reports/<path:filename>/presentation/status": OWNER,
    "/api/reports/<path:filename>/refly/status": OWNER,
    "/api/reports/<path:filename>/solution": OWNER,
    "/api/metrics": ADMIN,
    "/api/summaries": ADMIN,
    "/api/admin/config-center": ADMIN,
    "/api/admin/license-enforcement": ADMIN,
    "/api/admin/licenses": ADMIN,
    "/api/admin/licenses/<int:license_id>": ADMIN,
    "/api/admin/licenses/<int:license_id>/events": ADMIN,
    "/api/admin/licenses/bootstrap/status": ADMIN,
    "/api/admin/licenses/summary": ADMIN,
    "/api/admin/ownership-migrations": ADMIN,
    "/api/admin/presentation-feature": ADMIN,
    "/api/admin/usage/summary": ADMIN,
    "/api/admin/usage/users": ADMIN,
    "/api/admin/usage/users/<int:user_id>": ADMIN,
    "/api/admin/users": ADMIN,
}


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "route-grid-secret",
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

    owner, other, admin = (login(p) for p in
                           (OWNER_PHONE, OTHER_PHONE, ADMIN_PHONE))
    anon = HttpClient(app)

    owner_id = owner.get("/api/auth/me").get_json()["user"]["user_id"]
    r = admin.put(f"/api/admin/users/{owner_id}/level",
                  json_body={"level": "professional"})
    assert r.status_code == 200

    r = owner.post("/api/sessions", json_body={
        "topic": "路由网格访谈", "scenario_id": "product-requirement"})
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
    # a share token + an export asset so token/exports routes resolve
    share = owner.post(f"/api/reports/{report}/solution/share",
                       json_body={}).get_json()
    exp = owner.post(f"/api/reports/{report}/exports",
                     json_body={"format": "docx"}).get_json()
    r = admin.post("/api/admin/licenses/batch",
                   json_body={"count": 1, "level": "standard"})
    assert r.status_code in (200, 201), r.text
    lic = admin.get("/api/admin/licenses").get_json()
    license_id = lic[0]["license_id"]
    # presentation feature on, so the level gate (not the feature flag)
    # is what the presentation grid measures
    admin.post("/api/admin/presentation-feature",
               json_body={"enabled": True})

    yield {
        "app": app, "anon": anon, "owner": owner, "other": other,
        "admin": admin, "sid": sid, "report": report,
        "share_token": share.get("share_token", "tok"),
        "asset_id": exp.get("asset_id", "a1"),
        "owner_id": owner_id, "license_id": license_id, "login": login,
    }
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


# routes whose contract REQUIRES a query parameter
REQUIRED_QUERY = {
    "/api/admin/users": "?q=139",
}


def _fill(tmpl, ctx):
    return (tmpl
            .replace("<session_id>", ctx["sid"])
            .replace("<path:filename>", ctx["report"])
            .replace("<asset_id>", str(ctx["asset_id"]))
            .replace("<share_token>", ctx["share_token"])
            .replace("<int:license_id>", str(ctx["license_id"]))
            .replace("<int:user_id>", str(ctx["owner_id"]))
            .replace("<scenario_id>", "product-requirement")
            ) + REQUIRED_QUERY.get(tmpl, "")


# ---------------------------------------------------------------------------
# completeness: every served GET route is classified
# ---------------------------------------------------------------------------

def test_every_get_route_is_classified(ctx):
    served = {rule for _r, methods, _f, rule in ctx["app"]._routes
              if "GET" in methods}
    missing = sorted(served - set(GET_CLASSES))
    stale = sorted(set(GET_CLASSES) - served)
    assert not missing, (
        f"GET routes without an access classification: {missing} — "
        "add them to GET_CLASSES with an explicit access class")
    assert not stale, f"classified GET routes no longer served: {stale}"


# ---------------------------------------------------------------------------
# the enforced grid: every classified route x every actor
# ---------------------------------------------------------------------------

ROUTES_BY_CLASS = {}
for rule, cls in GET_CLASSES.items():
    ROUTES_BY_CLASS.setdefault(cls, []).append(rule)


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[PUBLIC] +
                         ROUTES_BY_CLASS[TOKEN])
def test_public_and_token_routes_serve_anonymous(ctx, rule):
    r = ctx["anon"].get(_fill(rule, ctx))
    assert r.status_code in (200, 302), (rule, r.status_code)


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[AUTHED] +
                         ROUTES_BY_CLASS[OWNER] + ROUTES_BY_CLASS[ADMIN])
def test_protected_routes_refuse_anonymous(ctx, rule):
    r = ctx["anon"].get(_fill(rule, ctx))
    assert r.status_code in (401, 403), (rule, r.status_code)


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[OWNER])
def test_owner_routes_hide_resources_from_other_users(ctx, rule):
    r = ctx["other"].get(_fill(rule, ctx))
    assert r.status_code in (403, 404), (
        f"IDOR: {rule} served another user's resource "
        f"({r.status_code})")


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[OWNER])
def test_owner_routes_serve_the_owner(ctx, rule):
    r = ctx["owner"].get(_fill(rule, ctx))
    # presentation/refly may legitimately 404 when the feature produced
    # no artifact yet — but never an auth refusal for the owner
    assert r.status_code not in (401, 403), (rule, r.status_code)


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[ADMIN])
def test_admin_routes_refuse_non_admin(ctx, rule):
    r = ctx["owner"].get(_fill(rule, ctx))
    assert r.status_code == 403, (rule, r.status_code)


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[ADMIN])
def test_admin_routes_serve_admin(ctx, rule):
    r = ctx["admin"].get(_fill(rule, ctx))
    assert r.status_code == 200, (rule, r.status_code, r.text[:200])


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[AUTHED])
def test_authed_routes_serve_any_account(ctx, rule):
    r = ctx["other"].get(_fill(rule, ctx))
    assert r.status_code == 200, (rule, r.status_code)


@pytest.mark.parametrize("rule", ROUTES_BY_CLASS[EXTERNAL])
def test_external_idp_routes_degrade_without_config(ctx, rule):
    # unconfigured WeChat answers 503 feature-unavailable, a 4xx
    # protocol error, or 401 on the auth-gated bind route — never an
    # unhandled 5xx crash
    for client in (ctx["anon"], ctx["owner"]):
        r = client.get(_fill(rule, ctx))
        assert r.status_code < 500 or r.status_code == 503, (
            rule, r.status_code)


# ---------------------------------------------------------------------------
# list isolation: the list endpoints never leak another user's records
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rule,id_key", [
    ("/api/sessions", "session_id"),
    ("/api/reports", "name"),
])
def test_list_endpoints_scope_to_caller(ctx, rule, id_key):
    mine = ctx["owner"].get(rule).get_json()
    items = mine["items"] if isinstance(mine, dict) and "items" in mine \
        else mine
    owned = {it.get(id_key) or it.get("report_name") for it in items}
    assert owned, f"owner sees no records on {rule}"
    theirs = ctx["other"].get(rule).get_json()
    items2 = theirs["items"] if isinstance(theirs, dict) and \
        "items" in theirs else theirs
    leaked = [it for it in items2
              if (it.get(id_key) or it.get("report_name")) in owned]
    assert not leaked, f"{rule} leaked owner records to another user"


# ---------------------------------------------------------------------------
# level grid: server enforcement == web/levels.py capability matrix,
# for every level (expectations DERIVED, not hand-written)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def leveled(ctx):
    """One logged-in client per level, each with a completed report."""
    out = {}
    for i, level in enumerate(LEVELS):
        c = ctx["login"](f"1390003000{i}")
        uid = c.get("/api/auth/me").get_json()["user"]["user_id"]
        r = ctx["admin"].put(f"/api/admin/users/{uid}/level",
                             json_body={"level": level})
        assert r.status_code == 200
        r = c.post("/api/sessions", json_body={
            "topic": f"等级网格-{level}",
            "scenario_id": "product-requirement"})
        sid = r.get_json()["session_id"]
        q = c.post(f"/api/sessions/{sid}/next-question",
                   json_body={}).get_json()
        c.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"], "answer": "预算两百万，分两期",
            "dimension": q.get("dimension"), "options": q.get("options")})
        r = c.post(f"/api/sessions/{sid}/generate-report",
                   json_body={"force": True})
        assert r.status_code == 202
        ctx["app"].state.report_queue.drain()
        st = c.get(f"/api/status/report-generation/{sid}").get_json()
        out[level] = {"client": c, "sid": sid,
                      "report": st["report_name"]}
    return out


@pytest.mark.parametrize("level", LEVELS)
@pytest.mark.parametrize("fmt", ["markdown", "docx", "pdf"])
def test_export_format_gate_matches_capability_matrix(leveled, level, fmt):
    allowed = level_allows(level, "exports", fmt)
    ent = leveled[level]
    r = ent["client"].post(f"/api/reports/{ent['report']}/exports",
                           json_body={"format": fmt})
    if allowed:
        assert r.status_code in (200, 201), (level, fmt, r.status_code)
    else:
        assert r.status_code == 403, (
            f"level {level} must not export {fmt}: got {r.status_code}")


@pytest.mark.parametrize("level", LEVELS)
@pytest.mark.parametrize("mode", ["quick", "standard", "deep"])
def test_interview_mode_gate_matches_capability_matrix(leveled, level,
                                                       mode):
    """Mode gating CLAMPS (levels.clamp_interview_mode) rather than
    refusing: a disallowed mode silently downgrades to the best mode
    the level affords — the stored session must never carry a mode the
    capability matrix forbids."""
    allowed = level_allows(level, "interview_modes", mode)
    ent = leveled[level]
    r = ent["client"].post("/api/sessions", json_body={
        "topic": f"模式网格-{level}-{mode}", "interview_mode": mode,
        "scenario_id": "product-requirement"})
    assert r.status_code == 201, (level, mode, r.status_code)
    sid = r.get_json()["session_id"]
    stored = ent["client"].get(f"/api/sessions/{sid}").get_json()
    effective = stored.get("interview_mode")
    if allowed:
        assert effective == mode, (level, mode, effective)
    else:
        assert effective != mode, (
            f"level {level} session stored forbidden mode {mode}")
        assert level_allows(level, "interview_modes", effective), (
            f"clamped mode {effective} still not allowed for {level}")


@pytest.mark.parametrize("level", LEVELS)
def test_share_gate_matches_capability_matrix(leveled, level):
    allowed = level_allows(level, "solution_share")
    ent = leveled[level]
    r = ent["client"].post(
        f"/api/reports/{ent['report']}/solution/share", json_body={})
    if allowed:
        assert r.status_code in (200, 201), (level, r.status_code)
    else:
        assert r.status_code == 403, f"level {level} must not share"


@pytest.mark.parametrize("level", LEVELS)
def test_custom_scenario_gate_matches_capability_matrix(leveled, level):
    allowed = level_allows(level, "custom_scenarios")
    ent = leveled[level]
    r = ent["client"].post("/api/scenarios/custom", json_body={
        "id": f"grid-{level}", "name": "网格场景", "description": "d",
        "dimensions": [{"id": "d1", "name": "维度",
                        "key_aspects": ["要点"]}]})
    if allowed:
        assert r.status_code in (200, 201), (level, r.status_code)
    else:
        assert r.status_code == 403, (
            f"level {level} must not create custom scenarios")


@pytest.mark.parametrize("level", LEVELS)
def test_presentation_gate_matches_capability_matrix(leveled, level):
    allowed = level_allows(level, "presentation")
    ent = leveled[level]
    r = ent["client"].post(f"/api/reports/{ent['report']}/refly",
                           json_body={})
    if not allowed:
        assert r.status_code == 403, (
            f"level {level} must not start presentations")
    else:
        # feature may be off / degraded in test env — but never a
        # level refusal for a professional account
        assert r.status_code != 403, (level, r.status_code)
