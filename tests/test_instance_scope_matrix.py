"""Two-tenant instance-scope matrix over ONE shared data directory.

The multi-instance deployment plan (docs/multi-instance-deployment.md;
reference instance-scope.md) runs several app instances against shared
storage, isolated only by INSTANCE_SCOPE_KEY.  This suite actually
BOOTS two apps on the same data dir with different scopes and proves
the same authenticated phone number cannot see across the fence:
session/report listings, direct reads, usage aggregates, and that the
scope audit CLI counts rows per scope correctly.
"""

import os
import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

USER_PHONE = "13900000101"


@pytest.fixture(scope="module")
def two_tenants():
    tmp = tempfile.TemporaryDirectory()

    def boot(scope):
        return create_app(data_dir=tmp.name, overrides={
            "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
            "AI_MODE": "template", "SECRET_KEY": "scope-matrix-secret",
            "SMS_SEND_COOLDOWN_SECONDS": "0",
            "INSTANCE_SCOPE_KEY": scope,
        })

    app_a = boot("tenant-a")
    app_b = boot("tenant-b")

    def login(app):
        c = HttpClient(app)
        c.post("/api/auth/sms/send-code", json_body={"phone": USER_PHONE})
        r = c.post("/api/auth/login/code",
                   json_body={"phone": USER_PHONE, "code": "666666"})
        assert r.status_code == 200, r.text
        return c

    ca, cb = login(app_a), login(app_b)

    def make_session_and_report(c, app, topic):
        r = c.post("/api/sessions", json_body={
            "topic": topic, "scenario_id": "product-requirement"})
        sid = r.get_json()["session_id"]
        q = c.post(f"/api/sessions/{sid}/next-question",
                   json_body={}).get_json()
        c.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"], "answer": "现状割裂，因为历史包袱",
            "dimension": q.get("dimension"), "options": q.get("options")})
        r = c.post(f"/api/sessions/{sid}/generate-report",
                   json_body={"force": True})
        assert r.status_code == 202, r.text
        app.state.report_queue.drain()
        st = c.get(f"/api/status/report-generation/{sid}").get_json()
        assert st["state"] == "completed", st
        return sid, st["report_name"]

    sid_a, rep_a = make_session_and_report(ca, app_a, "租户A的访谈")
    sid_b, rep_b = make_session_and_report(cb, app_b, "租户B的访谈")

    yield {"tmp": tmp.name,
           "a": {"app": app_a, "c": ca, "sid": sid_a, "rep": rep_a},
           "b": {"app": app_b, "c": cb, "sid": sid_b, "rep": rep_b}}
    for app in (app_a, app_b):
        app.state.report_queue.shutdown()
        app.state.shutdown()
    tmp.cleanup()


def test_session_listings_are_scope_fenced(two_tenants):
    a, b = two_tenants["a"], two_tenants["b"]
    for side, other in ((a, b), (b, a)):
        listed = side["c"].get("/api/sessions").get_json()
        items = listed if isinstance(listed, list) else listed["items"]
        ids = {s["session_id"] for s in items}
        assert side["sid"] in ids
        assert other["sid"] not in ids, (side, ids)


def test_report_listings_and_reads_are_scope_fenced(two_tenants):
    a, b = two_tenants["a"], two_tenants["b"]
    for side, other in ((a, b), (b, a)):
        listed = side["c"].get("/api/reports").get_json()
        items = listed if isinstance(listed, list) else listed["items"]
        names = {r.get("report_name") or r.get("name") for r in items}
        assert side["rep"] in names
        assert other["rep"] not in names
        # direct cross-scope read refused even with the exact name
        r = side["c"].get(f"/api/reports/{other['rep']}")
        assert r.status_code in (403, 404), r.status_code


def test_cross_scope_session_read_and_mutation_refused(two_tenants):
    a, b = two_tenants["a"], two_tenants["b"]
    r = a["c"].get(f"/api/sessions/{b['sid']}")
    assert r.status_code in (403, 404)
    r = a["c"].post(f"/api/sessions/{b['sid']}/next-question",
                    json_body={})
    assert r.status_code in (403, 404)
    r = a["c"].open(f"/api/sessions/{b['sid']}", method="DELETE")
    assert r.status_code in (403, 404)
    # and B's session is intact afterwards
    assert b["c"].get(f"/api/sessions/{b['sid']}").status_code == 200


def test_scope_rows_stamped_in_shared_index(two_tenants):
    from deepvision_tpu.web.meta_index import MetaIndex

    meta = MetaIndex(os.path.join(two_tenants["tmp"],
                                  "meta_index.sqlite3"))
    rows = meta.query(
        "SELECT instance_scope, COUNT(*) AS n FROM session_index "
        "GROUP BY instance_scope")
    counts = {r["instance_scope"]: r["n"] for r in rows}
    assert counts.get("tenant-a", 0) >= 1
    assert counts.get("tenant-b", 0) >= 1
    rows = meta.query(
        "SELECT instance_scope, COUNT(*) AS n FROM report_index "
        "WHERE deleted = 0 GROUP BY instance_scope")
    counts = {r["instance_scope"]: r["n"] for r in rows}
    assert counts.get("tenant-a", 0) >= 1
    assert counts.get("tenant-b", 0) >= 1
