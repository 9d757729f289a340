"""Report regeneration x profile version matrix.

One session regenerated under every profile the owner's level allows:
versions COEXIST as distinct report files, the session's
current_report_name tracks the newest, earlier versions stay readable/
exportable/deletable independently, the metrics stage machine records
each run, and a deletion of the CURRENT version falls back gracefully.
Mirrors reference regeneration semantics (versioned filenames,
web/server_modules/report_generation_runtime.py) at grid breadth.
"""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800001001"
USER_PHONE = "13900001001"


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "versioning-secret",
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

    admin = login(ADMIN_PHONE)
    user = login(USER_PHONE)
    uid = user.get("/api/auth/me").get_json()["user"]["user_id"]
    assert admin.put(f"/api/admin/users/{uid}/level",
                     json_body={"level": "professional"}).status_code == 200
    r = user.post("/api/sessions", json_body={
        "topic": "版本矩阵访谈", "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    q = user.post(f"/api/sessions/{sid}/next-question",
                  json_body={}).get_json()
    user.post(f"/api/sessions/{sid}/submit-answer", json_body={
        "question": q["question"], "answer": "预算三百万，因为要分两期",
        "dimension": q.get("dimension"), "options": q.get("options")})
    yield {"app": app, "user": user, "sid": sid}
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


def _generate(ctx, profile):
    user, sid, app = ctx["user"], ctx["sid"], ctx["app"]
    body = {"force": True}
    if profile:
        body["profile"] = profile
    r = user.post(f"/api/sessions/{sid}/generate-report", json_body=body)
    assert r.status_code == 202, (profile, r.text)
    app.state.report_queue.drain()
    st = user.get(f"/api/status/report-generation/{sid}").get_json()
    assert st["state"] == "completed", (profile, st)
    return st["report_name"]


def test_every_allowed_profile_produces_a_coexisting_version(ctx):
    names = {}
    for profile in (None, "balanced", "quality", "release-conservative"):
        names[profile or "default"] = _generate(ctx, profile)
    # versioning is PER PROFILE: the default (balanced) run overwrites
    # its own file, while each distinct profile coexists as its own
    # version (pinned elsewhere: quality never overwrites balanced)
    assert names["default"] == names["balanced"], names
    assert len({names["balanced"], names["quality"],
                names["release-conservative"]}) == 3, names
    # ALL versions remain readable
    for profile, name in names.items():
        r = ctx["user"].get(f"/api/reports/{name}")
        assert r.status_code == 200, (profile, r.status_code)
        assert "版本矩阵访谈" in r.text
    # the session points at the newest
    sess = ctx["user"].get(f"/api/sessions/{ctx['sid']}").get_json()
    assert sess.get("current_report_name") == \
        names["release-conservative"], sess.get("current_report_name")
    ctx["versions"] = names


def test_listing_contains_every_version_session_bound(ctx):
    listed = ctx["user"].get("/api/reports").get_json()
    items = listed if isinstance(listed, list) else listed.get("items", [])
    listed_names = {i.get("report_name") or i.get("name") for i in items}
    for name in ctx["versions"].values():
        assert name in listed_names, (name, listed_names)


def test_old_version_exports_and_deletes_independently(ctx):
    old = ctx["versions"]["balanced"]
    current = ctx["versions"]["release-conservative"]
    r = ctx["user"].post(f"/api/reports/{old}/exports",
                         json_body={"format": "markdown"})
    assert r.status_code == 201, r.text
    assert ctx["user"].open(f"/api/reports/{old}",
                            method="DELETE").status_code == 200
    assert ctx["user"].get(f"/api/reports/{old}").status_code == 404
    # the current version is untouched
    assert ctx["user"].get(f"/api/reports/{current}").status_code == 200


def test_deleting_current_version_degrades_gracefully(ctx):
    current = ctx["versions"]["release-conservative"]
    assert ctx["user"].open(f"/api/reports/{current}",
                            method="DELETE").status_code == 200
    # the session still loads; readiness/status never 5xx
    r = ctx["user"].get(f"/api/sessions/{ctx['sid']}")
    assert r.status_code == 200
    r = ctx["user"].get(
        f"/api/status/report-generation/{ctx['sid']}")
    assert r.status_code < 500
    # and a fresh regeneration works
    name = _generate(ctx, "balanced")
    assert ctx["user"].get(f"/api/reports/{name}").status_code == 200
