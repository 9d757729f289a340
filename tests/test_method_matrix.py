"""HTTP-method matrix over the full route table (VERDICT r4 #5).

For EVERY rule in the live route table, every standard verb the rule
does NOT declare must answer 405 (or 404 for param routes whose filled
path only resolves under the declared verb's router) — never 2xx (a
write executing under the wrong verb) and never 5xx.  The reference
pins these by hand per endpoint in test_api_comprehensive.py
(/root/reference/tests/); here the table drives it, so a route added
with a sloppy method list fails the day it ships.

HEAD is asserted separately: every GET route must answer HEAD with the
GET status and an EMPTY body (WSGI contract the access-log filter and
nginx health checks rely on).
"""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800008001"
USER_PHONE = "13900008001"
VERBS = ("GET", "POST", "PUT", "DELETE", "PATCH")


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "method-matrix-secret",
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

    user = login(USER_PHONE)
    admin = login(ADMIN_PHONE)
    r = user.post("/api/sessions", json_body={
        "topic": "方法矩阵访谈", "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    yield {"app": app, "user": user, "admin": admin, "sid": sid}
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


def _fill(rule, ctx):
    return (rule
            .replace("<session_id>", ctx["sid"])
            .replace("<path:filename>", "no-such-report.md")
            .replace("<path:doc_name>", "no-such-doc.docx")
            .replace("<scenario_id>", "product-requirement")
            .replace("<share_token>", "no-such-token")
            .replace("<int:license_id>", "1")
            .replace("<int:user_id>", "1")
            .replace("<path:filename>", "x"))


def _rules(app):
    """rule -> set of declared methods, merged across registrations."""
    merged = {}
    for _r, methods, _f, rule in app._routes:
        merged.setdefault(rule, set()).update(methods)
    return merged


def test_undeclared_verbs_never_execute_or_crash(ctx):
    app = ctx["app"]
    # the admin client maximizes reachability: a wrong-verb 2xx must not
    # hide behind a 401/403 that fires first
    c = ctx["admin"]
    failures = []
    for rule, methods in sorted(_rules(app).items()):
        if rule in ("/", "/<static:filename>"):
            continue  # static file plumbing: GET-only by router design
        path = _fill(rule, ctx)
        for verb in VERBS:
            if verb in methods:
                continue
            r = c.open(path, method=verb, json_body={})
            if r.status_code >= 500 or 200 <= r.status_code < 300:
                failures.append((verb, rule, r.status_code))
    assert not failures, failures


def test_wrong_verb_is_405_where_path_resolves(ctx):
    """Where the path matches NO rule under the attempted verb but some
    rule under another verb, the router must answer 405 with an Allow
    header — the contract clients key error handling on.  Paths a
    param route shadows under the attempted verb (e.g. GET
    /api/reports/batch-delete is a valid report-detail path) keep that
    route's own semantics, exactly as the reference's Flask router
    behaves, so they are excluded here (covered by the no-2xx/no-5xx
    sweep above)."""
    app = ctx["app"]
    c = ctx["admin"]
    failures = []
    for rule, methods in sorted(_rules(app).items()):
        if "<" in rule or rule in ("/",):
            continue  # param-free rules give a clean fill
        path = _fill(rule, ctx)
        for verb in VERBS:
            if verb in methods:
                continue
            eff = "GET" if verb == "HEAD" else verb
            shadowed = any(
                regex.match(path) and eff in ms
                for regex, ms, _f, _rule in app._routes)
            if shadowed:
                continue
            r = c.open(path, method=verb, json_body={})
            if r.status_code != 405 or not r.headers.get("Allow"):
                failures.append((verb, rule, r.status_code,
                                 r.headers.get("Allow")))
    assert not failures, failures


def test_options_is_harmless_everywhere(ctx):
    app = ctx["app"]
    c = ctx["user"]
    failures = []
    for rule in sorted(_rules(app)):
        path = _fill(rule, ctx)
        r = c.open(path, method="OPTIONS")
        if r.status_code >= 500:
            failures.append((rule, r.status_code))
    assert not failures, failures


def test_head_mirrors_get_with_empty_body(ctx):
    app = ctx["app"]
    c = ctx["admin"]
    failures = []
    for rule, methods in sorted(_rules(app).items()):
        if "GET" not in methods or "<" in rule:
            continue
        path = _fill(rule, ctx)
        g = c.open(path, method="GET")
        h = c.open(path, method="HEAD")
        if h.status_code != g.status_code:
            # HEAD must mirror GET's status — including the deliberate
            # 503 of unconfigured external-IdP routes
            failures.append((rule, "status mismatch",
                             g.status_code, h.status_code))
            continue
        if g.status_code < 300 and h.data not in (b"", None):
            failures.append((rule, "non-empty HEAD body", len(h.data)))
    assert not failures, failures
