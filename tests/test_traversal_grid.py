"""Path-traversal payload corpus x every param-bearing route.

tests/test_security_hardening.py pins a handful of traversal shapes on
three routes; this grid crosses a full corpus (dot-dot, absolute,
URL-encoded, double-encoded, backslash, NUL, overlong segments) with
EVERY route whose rule carries a path-like parameter — enumerated from
the live route table, so a new filename-taking route is covered the day
it ships.  The contract everywhere: a 4xx family answer, never a 5xx,
and never the canary file's content.

Reference class: /root/reference/tests/test_security_regression.py
(report/document name traversal cases).
"""

import os
import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

USER_PHONE = "13900007001"
CANARY = "TRAVERSAL-CANARY-7f3a"

TRAVERSALS = [
    "../canary.txt",
    "..%2Fcanary.txt",
    "%2e%2e%2fcanary.txt",
    "..%252fcanary.txt",
    "....//canary.txt",
    "..\\canary.txt",
    "/etc/passwd",
    "//etc//passwd",
    "..%5Ccanary.txt",
    "canary.txt%00.md",
    "a/" * 60 + "../" * 62 + "canary.txt",
]


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    # the canary sits one level ABOVE the data dir: reachable only by
    # escaping the store root
    canary_path = os.path.join(tmp.name, "canary.txt")
    with open(canary_path, "w") as fh:
        fh.write(CANARY)
    data_dir = os.path.join(tmp.name, "data")
    os.makedirs(data_dir)
    app = create_app(data_dir=data_dir, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "traversal-grid-secret",
        "SMS_SEND_COOLDOWN_SECONDS": "0",
    })
    c = HttpClient(app)
    c.post("/api/auth/sms/send-code", json_body={"phone": USER_PHONE})
    r = c.post("/api/auth/login/code",
               json_body={"phone": USER_PHONE, "code": "666666"})
    assert r.status_code == 200, r.text
    r = c.post("/api/sessions", json_body={
        "topic": "穿越网格访谈", "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    yield {"app": app, "client": c, "sid": sid}
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


PATH_PARAMS = ("<path:filename>", "<path:doc_name>", "<share_token>",
               "<scenario_id>", "<asset_id>", "<static:filename>")


def param_routes(app):
    """Every (method, rule, param) with a path-like parameter."""
    out = []
    for _r, methods, _f, rule in app._routes:
        for p in PATH_PARAMS:
            if p in rule:
                for m in sorted(set(methods) - {"HEAD", "OPTIONS"}):
                    out.append((m, rule, p))
    return sorted(set(out))


def _fill(rule, param, payload, ctx):
    filled = rule.replace(param, payload)
    # any OTHER params get benign values
    return (filled
            .replace("<session_id>", ctx["sid"])
            .replace("<path:filename>", "no-such.md")
            .replace("<path:doc_name>", "no-such.docx")
            .replace("<share_token>", "no-such-token")
            .replace("<scenario_id>", "no-such")
            .replace("<asset_id>", "no-such"))


def test_grid_covers_the_table(ctx):
    routes = param_routes(ctx["app"])
    # currently: report family, documents, scenarios, share token,
    # exports asset, static files — shrinkage means enumeration broke
    assert len(routes) >= 15, routes


def test_traversal_never_escapes_or_crashes(ctx):
    app = ctx["app"]
    c = ctx["client"]
    failures = []
    for m, rule, param in param_routes(app):
        for payload in TRAVERSALS:
            path = _fill(rule, param, payload, ctx)
            r = c.open(path, method=m,
                       json_body={} if m != "GET" else None)
            if r.status_code >= 500:
                failures.append((m, rule, payload, r.status_code))
            elif CANARY in (r.text or ""):
                failures.append((m, rule, payload, "CANARY LEAKED"))
            elif r.status_code < 300 and m == "GET" and \
                    "passwd" in payload and b"root:" in (r.data or b""):
                failures.append((m, rule, payload, "/etc/passwd LEAKED"))
    assert not failures, failures


def test_static_route_never_serves_outside_static_dir(ctx):
    c = ctx["client"]
    for payload in TRAVERSALS:
        r = c.get("/" + payload)
        assert r.status_code in (301, 302, 400, 404), (payload,
                                                       r.status_code)
        assert CANARY not in (r.text or "")
        assert b"root:" not in (r.data or b"")


def test_traversal_in_query_params_inert(ctx):
    """List endpoints taking name-ish query params must treat traversal
    shapes as data."""
    c = ctx["client"]
    for payload in TRAVERSALS:
        for path in (f"/api/sessions?q={payload}",
                     f"/api/reports?q={payload}",
                     f"/api/scenarios?keyword={payload}"):
            r = c.get(path)
            assert r.status_code < 500, (path, r.status_code)
            assert CANARY not in (r.text or "")
