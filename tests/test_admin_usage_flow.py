"""Admin usage-report contract: numbers trace back to real actions.

The reference's admin usage endpoints aggregate per-user session/report
activity (/api/admin/usage/*, web/server.py routes_admin family).  This
suite performs a KNOWN series of actions with two users and asserts the
usage aggregates reflect them exactly — summary totals, per-user rows,
per-user detail, level-change audit trail — plus the paging/query
contract of /api/admin/users.
"""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800002001"
ALICE_PHONE = "13900002001"
BOB_PHONE = "13900002002"


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "usage-flow-secret",
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

    admin, alice, bob = (login(p) for p in
                         (ADMIN_PHONE, ALICE_PHONE, BOB_PHONE))

    def run_session(client, topic, finish=True):
        r = client.post("/api/sessions", json_body={
            "topic": topic, "scenario_id": "product-requirement"})
        sid = r.get_json()["session_id"]
        q = client.post(f"/api/sessions/{sid}/next-question",
                        json_body={}).get_json()
        client.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"], "answer": "现状靠人工，因为系统老旧",
            "dimension": q.get("dimension"), "options": q.get("options")})
        if finish:
            r = client.post(f"/api/sessions/{sid}/generate-report",
                            json_body={"force": True})
            assert r.status_code == 202, r.text
            app.state.report_queue.drain()
            st = client.get(
                f"/api/status/report-generation/{sid}").get_json()
            assert st["state"] == "completed", st
        return sid

    # alice: 2 sessions, 1 report; bob: 1 session, 1 report
    run_session(alice, "爱丽丝的访谈甲", finish=True)
    run_session(alice, "爱丽丝的访谈乙", finish=False)
    run_session(bob, "鲍勃的访谈", finish=True)

    ids = {}
    for name, c in (("alice", alice), ("bob", bob)):
        ids[name] = c.get("/api/auth/me").get_json()["user"]["user_id"]
    yield {"app": app, "admin": admin, "alice": alice, "bob": bob,
           "ids": ids}
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


def test_usage_summary_totals_match_actions(ctx):
    s = ctx["admin"].get("/api/admin/usage/summary").get_json()
    assert s["users"] >= 3          # admin + alice + bob
    assert s["sessions"] == 3
    assert s["reports"] == 2
    assert "report_queue" in s and "ai_calls" in s


def test_usage_users_rows_attribute_per_user(ctx):
    rows = ctx["admin"].get("/api/admin/usage/users").get_json()
    by_id = {str(r.get("owner_user_id")): r for r in rows}
    a = by_id[str(ctx["ids"]["alice"])]
    b = by_id[str(ctx["ids"]["bob"])]
    assert a["sessions"] == 2, a
    assert b["sessions"] == 1, b
    assert a.get("last_active"), a


def test_usage_user_detail_lists_the_actual_records(ctx):
    uid = ctx["ids"]["alice"]
    d = ctx["admin"].get(f"/api/admin/usage/users/{uid}").get_json()
    assert d["session_count"] == 2 and d["report_count"] == 1, d
    topics = {s.get("topic") for s in d.get("recent_sessions", [])}
    assert {"爱丽丝的访谈甲", "爱丽丝的访谈乙"} <= topics, d
    assert len(d.get("recent_reports", [])) == 1
    assert str(d.get("user", {}).get("user_id")) == str(uid)


def test_usage_requires_admin(ctx):
    for path in ("/api/admin/usage/summary", "/api/admin/usage/users"):
        r = ctx["alice"].get(path)
        assert r.status_code == 403, (path, r.status_code)


def test_level_change_appears_in_user_listing(ctx):
    uid = ctx["ids"]["bob"]
    r = ctx["admin"].put(f"/api/admin/users/{uid}/level",
                         json_body={"level": "standard"})
    assert r.status_code == 200
    rows = ctx["admin"].get("/api/admin/users?q=139000020").get_json()
    items = rows if isinstance(rows, list) else rows.get("items", [])
    bob_row = [u for u in items if str(u.get("user_id")) == str(uid)]
    assert bob_row and bob_row[0].get("level") == "standard", items


def test_admin_users_query_is_required_and_scoped(ctx):
    r = ctx["admin"].get("/api/admin/users?q=139000020")
    items = r.get_json()
    items = items if isinstance(items, list) else items.get("items", [])
    phones = {u.get("phone", "") for u in items}
    assert all(p.startswith("139000020") for p in phones if p), phones
