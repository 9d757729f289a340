"""License-enforcement grid over the ENTIRE route table.

The reference default-denies the whole /api/ surface when enforcement
is on (enforce_auth_for_protected_routes + is_license_protected_route,
/root/reference/web/server.py:12831-12894).  This repo now mirrors that
as a before-request hook; this grid proves it for EVERY route, with the
expectation derived from the same allowlist rule the server uses:

  * unlicensed non-admin  -> 403 license_required on every gated route
  * the allowlist (status, license status/activate, bootstrap, auth,
    public) stays reachable
  * activation flips every gated route open in one step
  * admins are exempt everywhere
  * enforcement OFF -> the hook is inert on the full table

A route added tomorrow is in this grid automatically, on both sides of
the rule.
"""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app, license_gate_applies

ADMIN_PHONE = "13800005001"
USER_PHONE = "13900005001"


def _mk_app(enforce):
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "license-grid-secret",
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "SMS_SEND_COOLDOWN_SECONDS": "0",
        "LICENSE_ENFORCEMENT_ENABLED": enforce,
    })
    app._tmp = tmp
    return app


def _login(app, phone):
    c = HttpClient(app)
    c.post("/api/auth/sms/send-code", json_body={"phone": phone})
    r = c.post("/api/auth/login/code",
               json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return c


def _fill(rule):
    return (rule
            .replace("<session_id>", "dv-nope")
            .replace("<path:filename>", "no-such.md")
            .replace("<path:doc_name>", "no.docx")
            .replace("<scenario_id>", "product-requirement")
            .replace("<share_token>", "no-token")
            .replace("<asset_id>", "no-asset")
            .replace("<int:license_id>", "1")
            .replace("<int:user_id>", "1"))


# the sweep drives ONE logged-in client across every route; auth routes
# that destroy or rebind the very session doing the sweeping are
# exercised by their own suites (they are allowlisted from the gate
# either way — pinned in test_rule_mirror_matches_reference_semantics)
SESSION_DESTROYING = {
    "/api/auth/logout", "/api/auth/account-merge/apply",
    "/api/auth/bind/phone",
}


def _api_routes(app):
    out = []
    for _r, methods, _f, rule in app._routes:
        if not rule.startswith("/api/") or rule in SESSION_DESTROYING:
            continue
        for m in sorted(set(methods) - {"HEAD", "OPTIONS"}):
            out.append((m, rule))
    return sorted(set(out))


def test_gate_blocks_every_protected_route_for_unlicensed_user():
    app = _mk_app(True)
    try:
        user = _login(app, USER_PHONE)
        failures = []
        for m, rule in _api_routes(app):
            gated = license_gate_applies(rule, m)
            r = user.open(_fill(rule), method=m,
                          json_body={} if m != "GET" else None)
            body = r.get_json() or {}
            if gated:
                # admin routes 403 either way; the license hook must
                # fire FIRST so no business handler ran — pin the
                # payload marker on non-admin routes
                if not rule.startswith("/api/admin") and (
                        r.status_code != 403
                        or body.get("license_required") is not True):
                    failures.append((m, rule, r.status_code, body))
            else:
                if r.status_code == 403 and body.get("license_required"):
                    failures.append((m, rule, "gated allowlisted route"))
        assert not failures, failures
    finally:
        app.state.shutdown()
        app._tmp.cleanup()


def test_activation_opens_the_whole_surface():
    app = _mk_app(True)
    try:
        admin = _login(app, ADMIN_PHONE)
        codes = admin.post("/api/admin/licenses/batch", json_body={
            "count": 1, "level": "professional"}).get_json()["codes"]
        user = _login(app, USER_PHONE)
        assert user.post("/api/sessions", json_body={
            "topic": "t", "scenario_id": "product-requirement"}
        ).status_code == 403
        assert user.post("/api/licenses/activate",
                         json_body={"code": codes[0]}).status_code == 200
        failures = []
        for m, rule in _api_routes(app):
            r = user.open(_fill(rule), method=m,
                          json_body={} if m != "GET" else None)
            body = r.get_json() or {}
            if r.status_code == 403 and body.get("license_required"):
                failures.append((m, rule))
        assert not failures, failures
    finally:
        app.state.shutdown()
        app._tmp.cleanup()


def test_admin_is_exempt_across_the_surface():
    app = _mk_app(True)
    try:
        admin = _login(app, ADMIN_PHONE)
        failures = []
        for m, rule in _api_routes(app):
            r = admin.open(_fill(rule), method=m,
                           json_body={} if m != "GET" else None)
            body = r.get_json() or {}
            if r.status_code == 403 and body.get("license_required"):
                failures.append((m, rule))
        assert not failures, failures
    finally:
        app.state.shutdown()
        app._tmp.cleanup()


def test_enforcement_off_is_fully_inert():
    app = _mk_app(False)
    try:
        user = _login(app, USER_PHONE)
        failures = []
        for m, rule in _api_routes(app):
            r = user.open(_fill(rule), method=m,
                          json_body={} if m != "GET" else None)
            body = r.get_json() or {}
            if r.status_code == 403 and body.get("license_required"):
                failures.append((m, rule))
        assert not failures, failures
    finally:
        app.state.shutdown()
        app._tmp.cleanup()


def test_rule_mirror_matches_reference_semantics():
    """license_gate_applies is the load-bearing classification; pin its
    edges (reference is_license_protected_route:12841-12851)."""
    assert license_gate_applies("/api/sessions", "POST")
    assert license_gate_applies("/api/reports", "GET")
    assert license_gate_applies("/api/admin/licenses", "GET")
    assert not license_gate_applies("/api/sessions", "OPTIONS")
    assert not license_gate_applies("/api/status", "GET")
    assert not license_gate_applies("/api/status/web-search", "GET")
    assert not license_gate_applies("/api/licenses/current", "GET")
    assert not license_gate_applies("/api/licenses/activate", "POST")
    assert not license_gate_applies("/api/admin/licenses/bootstrap", "POST")
    assert not license_gate_applies("/api/auth/login", "POST")
    assert not license_gate_applies("/api/public/solutions/x", "GET")
    assert not license_gate_applies("/help.html", "GET")
    # status pollers (thinking/report progress) ARE gated, same as the
    # reference — an unlicensed account cannot have sessions to poll
    assert license_gate_applies("/api/status/thinking/sid", "GET")
