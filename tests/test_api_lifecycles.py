"""Deep API lifecycle tests — level capabilities, license lifecycle,
report profiles/variants, batch deletion, scope isolation, overload
guards, custom scenarios, exports-follow-level.

Ports the behavior classes of the reference's test_api_comprehensive.py
(6.5k LoC; e.g. test_new_license_replaces_old_license_and_switches_level,
test_batch_delete_sessions_with_linked_reports,
test_experience_user_cannot_request_quality_report) onto this framework's
HTTP surface, with the template AI backend (real routes, fake AI —
SURVEY.md §4)."""

import os
import tempfile

import pytest

from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800000001"


def _mkapp(tmp, scope="default", extra=None):
    overrides = {
        "AI_MODE": "template",
        "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666",
        "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "INSTANCE_SCOPE_KEY": scope,
        # lifecycle tests re-login the same phone many times
        "SMS_SEND_COOLDOWN_SECONDS": 0,
        "SMS_DAILY_CAP": 1000,
    }
    overrides.update(extra or {})
    return create_app(data_dir=tmp, overrides=overrides)


@pytest.fixture()
def client():
    tmp = tempfile.TemporaryDirectory()
    app = _mkapp(tmp.name)
    c = app.test_client()
    c._app = app
    c._tmp = tmp
    yield c
    app.state.shutdown()
    tmp.cleanup()


def login(client, phone="13900000001"):
    client.post("/api/auth/sms/send-code", json_body={"phone": phone})
    r = client.post("/api/auth/login/code",
                    json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return r.get_json()["user"]


def make_session(client, topic="需求调研", mode="quick", **kw):
    r = client.post("/api/sessions", json_body={
        "topic": topic, "scenario_id": "product-requirement",
        "interview_mode": mode, **kw,
    })
    assert r.status_code == 201, r.text
    return r.get_json()


def answer_once(client, sid, answer="我们主要的诉求是整合分散的数据，因为目前有三套系统"):
    q = client.post(f"/api/sessions/{sid}/next-question",
                    json_body={}).get_json()
    assert q.get("question"), q
    r = client.post(f"/api/sessions/{sid}/submit-answer", json_body={
        "question": q["question"], "answer": answer,
        "dimension": q.get("dimension"), "options": q.get("options"),
    })
    assert r.status_code == 200, r.text
    return q


def generate_report(client, sid, profile=None):
    body = {"force": True}
    if profile:
        body["profile"] = profile
    r = client.post(f"/api/sessions/{sid}/generate-report", json_body=body)
    assert r.status_code == 202, r.text
    client.app.state.report_queue.drain()
    status = client.get(f"/api/status/report-generation/{sid}").get_json()
    assert status["state"] == "completed", status
    return status["report_name"]


def set_level(client, user_id, level):
    """Admin raises a user's level (PUT /api/admin/users/<id>/level)."""
    client.post("/api/auth/logout")
    login(client, ADMIN_PHONE)
    r = client.put(f"/api/admin/users/{user_id}/level",
                   json_body={"level": level})
    assert r.status_code == 200, r.text
    client.post("/api/auth/logout")


# ---------------------------------------------------------------------------
# Level capability matrix
# ---------------------------------------------------------------------------

def test_experience_mode_clamped_to_quick(client):
    login(client)
    s = make_session(client, mode="deep")
    assert s["interview_mode"] == "quick"
    assert s["depth_v2"]["mode"] == "quick"


def test_standard_user_gets_standard_but_not_deep(client):
    user = login(client, "13900000050")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000050")
    assert make_session(client, mode="standard")["interview_mode"] == \
        "standard"
    assert make_session(client, mode="deep")["interview_mode"] == "standard"


def test_professional_user_can_go_deep(client):
    user = login(client, "13900000051")
    set_level(client, user["user_id"], "professional")
    login(client, "13900000051")
    assert make_session(client, mode="deep")["interview_mode"] == "deep"


def test_experience_session_cap_enforced(client):
    login(client, "13900000052")
    for i in range(5):
        make_session(client, topic=f"主题{i}")
    r = client.post("/api/sessions", json_body={
        "topic": "第六个", "scenario_id": "product-requirement"})
    assert r.status_code == 403, r.text
    body = r.get_json()
    assert body["session_limit_reached"] is True
    assert body["session_count"] == 5
    # deleting one frees a slot
    sid = client.get("/api/sessions").get_json()[0]["session_id"]
    client.delete(f"/api/sessions/{sid}")
    assert client.post("/api/sessions", json_body={
        "topic": "补位", "scenario_id": "product-requirement"
    }).status_code == 201


def test_session_cap_counts_only_in_progress(client):
    """Completing an interview (report generated -> status completed)
    frees cap quota — the cap is on CONCURRENT in-progress sessions, not
    lifetime interviews."""
    login(client, "13900000053")
    sids = [make_session(client, topic=f"在途{i}")["session_id"]
            for i in range(5)]
    assert client.post("/api/sessions", json_body={
        "topic": "超限", "scenario_id": "product-requirement"
    }).status_code == 403
    answer_once(client, sids[0])
    generate_report(client, sids[0])  # flips session to completed
    r = client.post("/api/sessions", json_body={
        "topic": "完成后补位", "scenario_id": "product-requirement"})
    assert r.status_code == 201, r.text


def test_session_cap_lifts_with_level(client):
    user = login(client, "13900000053")
    for i in range(5):
        make_session(client, topic=f"主题{i}")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000053")
    assert client.post("/api/sessions", json_body={
        "topic": "第六个", "scenario_id": "product-requirement"
    }).status_code == 201


# ---------------------------------------------------------------------------
# Report profiles / variants
# ---------------------------------------------------------------------------

def test_experience_cannot_request_quality_report(client):
    login(client, "13900000060")
    sid = make_session(client)["session_id"]
    answer_once(client, sid)
    r = client.post(f"/api/sessions/{sid}/generate-report",
                    json_body={"force": True, "profile": "quality"})
    assert r.status_code == 403, r.text
    body = r.get_json()
    assert body["error_code"] == "level_capability_denied"
    assert body["capability_key"] == "report.profile.quality"
    assert body["current_level"]["key"] == "experience"
    assert body["required_level"]["key"] == "standard"


def test_report_profile_accepts_reference_key_name(client):
    """The reference frontend sends report_profile, not profile."""
    login(client, "13900000061")
    sid = make_session(client)["session_id"]
    answer_once(client, sid)
    r = client.post(
        f"/api/sessions/{sid}/generate-report",
        json_body={"force": True, "report_profile": "quality"})
    assert r.status_code == 403  # still experience level — gate applies


def test_invalid_report_profile_rejected(client):
    login(client, "13900000062")
    sid = make_session(client)["session_id"]
    answer_once(client, sid)
    r = client.post(f"/api/sessions/{sid}/generate-report",
                    json_body={"force": True, "profile": "turbo-max"})
    assert r.status_code == 400


def test_quality_variant_does_not_overwrite_balanced(client):
    user = login(client, "13900000063")
    set_level(client, user["user_id"], "professional")
    login(client, "13900000063")
    sid = make_session(client, topic="变体测试")["session_id"]
    answer_once(client, sid)
    balanced = generate_report(client, sid)
    quality = generate_report(client, sid, profile="quality")
    assert balanced != quality
    assert quality.endswith("-quality.md")
    # both stay listed and loadable
    names = {r["report_name"]
             for r in client.get("/api/reports").get_json()}
    assert {balanced, quality} <= names
    assert client.get(f"/api/reports/{balanced}").status_code == 200
    assert client.get(f"/api/reports/{quality}").status_code == 200


def test_regenerate_overwrites_current_session_report(client):
    login(client, "13900000064")
    sid = make_session(client, topic="重复生成")["session_id"]
    answer_once(client, sid)
    first = generate_report(client, sid)
    second = generate_report(client, sid)
    assert first == second  # same session+topic => same bound filename
    sess = client.get(f"/api/sessions/{sid}").get_json()
    assert sess["current_report_name"] == second


def test_same_topic_sessions_get_unique_filenames(client):
    login(client, "13900000065")
    sid_a = make_session(client, topic="同名主题")["session_id"]
    sid_b = make_session(client, topic="同名主题")["session_id"]
    answer_once(client, sid_a)
    answer_once(client, sid_b)
    name_a = generate_report(client, sid_a)
    name_b = generate_report(client, sid_b)
    assert name_a != name_b
    assert sid_a in name_a and sid_b in name_b


def test_retrigger_returns_active_payload_not_duplicate(client, monkeypatch):
    login(client, "13900000066")
    sid = make_session(client)["session_id"]
    answer_once(client, sid)
    queue = client.app.state.report_queue
    monkeypatch.setattr(queue, "test_delay_s", 0.6)
    r1 = client.post(f"/api/sessions/{sid}/generate-report",
                     json_body={"force": True})
    assert r1.status_code == 202
    submitted_before = queue.submitted
    r2 = client.post(f"/api/sessions/{sid}/generate-report",
                     json_body={"force": True})
    assert r2.status_code == 200, r2.text
    body = r2.get_json()
    assert body["already_active"] is True
    assert body["state"] in ("queued", "building_prompt", "generating")
    assert queue.submitted == submitted_before  # no second job
    queue.drain()


def test_report_queue_full_returns_429(client):
    login(client, "13900000067")
    sids = []
    for i in range(3):
        sid = make_session(client, topic=f"排队{i}")["session_id"]
        answer_once(client, sid)
        sids.append(sid)
    queue = client.app.state.report_queue
    # exhaust pending slots so the next submit fast-fails
    held = 0
    while queue._pending.acquire(blocking=False):  # noqa: SLF001
        held += 1
    try:
        r = client.post(f"/api/sessions/{sids[0]}/generate-report",
                        json_body={"force": True})
        assert r.status_code == 429
        assert r.headers.get("Retry-After")
    finally:
        for _ in range(held):
            queue._pending.release()  # noqa: SLF001


# ---------------------------------------------------------------------------
# Batch deletion with linked reports + scope rules
# ---------------------------------------------------------------------------

def test_batch_delete_sessions_with_linked_reports(client):
    login(client, "13900000070")
    sid_a = make_session(client, topic="批删A")["session_id"]
    sid_b = make_session(client, topic="批删B")["session_id"]
    answer_once(client, sid_a)
    answer_once(client, sid_b)
    rep_a = generate_report(client, sid_a)
    rep_b = generate_report(client, sid_b)

    r = client.post("/api/sessions/batch-delete", json_body={
        "session_ids": [sid_a, sid_b], "delete_reports": True})
    body = r.get_json()
    assert sorted(body["deleted_sessions"]) == sorted([sid_a, sid_b])
    assert sorted(body["deleted_reports"]) == sorted([rep_a, rep_b])
    listed = {x["report_name"] for x in client.get("/api/reports").get_json()}
    assert rep_a not in listed and rep_b not in listed
    assert client.get(f"/api/reports/{rep_a}").status_code == 404


def test_batch_delete_without_flag_keeps_reports(client):
    login(client, "13900000071")
    sid = make_session(client, topic="留报告")["session_id"]
    answer_once(client, sid)
    rep = generate_report(client, sid)
    client.post("/api/sessions/batch-delete",
                json_body={"session_ids": [sid]})
    assert client.get(f"/api/reports/{rep}").status_code == 200


def test_batch_delete_skips_other_users_sessions(client):
    login(client, "13900000072")
    foreign = make_session(client, topic="别人的")["session_id"]
    client.post("/api/auth/logout")
    login(client, "13900000073")
    mine = make_session(client, topic="我的")["session_id"]
    r = client.post("/api/sessions/batch-delete", json_body={
        "session_ids": [foreign, mine]})
    assert r.get_json()["deleted_sessions"] == [mine]
    client.post("/api/auth/logout")
    login(client, "13900000072")
    assert client.get(f"/api/sessions/{foreign}").status_code == 200


# ---------------------------------------------------------------------------
# Instance scope isolation (same user, two tenants, shared data dir)
# ---------------------------------------------------------------------------

def test_instance_scope_isolates_sessions_and_reports():
    tmp = tempfile.TemporaryDirectory()
    app_a = _mkapp(tmp.name, scope="tenant-a")
    try:
        ca = app_a.test_client()
        login(ca, "13900000080")
        sid = make_session(ca, topic="租户A会话")["session_id"]
        answer_once(ca, sid)
        rep = generate_report(ca, sid)
        app_a.state.shutdown()

        app_b = _mkapp(tmp.name, scope="tenant-b")
        try:
            cb = app_b.test_client()
            login(cb, "13900000080")  # same phone -> same user
            assert cb.get("/api/sessions").get_json() == []
            assert cb.get("/api/reports").get_json() == []
            # direct access is masked as 404 (existence hidden), not 403
            assert cb.get(f"/api/sessions/{sid}").status_code == 404
            assert cb.get(f"/api/reports/{rep}").status_code == 404
            # cross-scope batch delete must not delete tenant A's report
            r = cb.post("/api/sessions/batch-delete", json_body={
                "session_ids": [sid], "delete_reports": True})
            assert r.get_json()["deleted_sessions"] == []
        finally:
            app_b.state.shutdown()

        app_a2 = _mkapp(tmp.name, scope="tenant-a")
        try:
            ca2 = app_a2.test_client()
            login(ca2, "13900000080")
            assert ca2.get(f"/api/reports/{rep}").status_code == 200
        finally:
            app_a2.state.shutdown()
    finally:
        tmp.cleanup()


# ---------------------------------------------------------------------------
# Pagination + list guards
# ---------------------------------------------------------------------------

def test_sessions_pagination_headers_and_bounds(client):
    user = login(client, "13900000090")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000090")
    for i in range(7):
        make_session(client, topic=f"分页{i}")
    r = client.get("/api/sessions?page=1&page_size=3")
    assert r.headers["X-Total-Count"] == "7"
    assert len(r.get_json()) == 3
    r2 = client.get("/api/sessions?page=3&page_size=3")
    assert len(r2.get_json()) == 1
    # page_size above the max is clamped, not an error
    r3 = client.get("/api/sessions?page=1&page_size=9999")
    assert r3.status_code == 200
    assert len(r3.get_json()) == 7
    # pages partition the result set without overlap
    p1 = {x["session_id"] for x in
          client.get("/api/sessions?page=1&page_size=4").get_json()}
    p2 = {x["session_id"] for x in
          client.get("/api/sessions?page=2&page_size=4").get_json()}
    assert not (p1 & p2) and len(p1 | p2) == 7


def test_reports_pagination_headers(client):
    user = login(client, "13900000091")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000091")
    for i in range(3):
        sid = make_session(client, topic=f"报告分页{i}")["session_id"]
        answer_once(client, sid)
        generate_report(client, sid)
    r = client.get("/api/reports?page=1&page_size=2")
    assert r.headers["X-Total-Count"] == "3"
    assert len(r.get_json()) == 2
    etag = r.headers["ETag"]
    assert client.get("/api/reports?page=1&page_size=2",
                      headers={"If-None-Match": etag}).status_code == 304


def test_next_question_429_when_slots_exhausted(client):
    login(client, "13900000092")
    sid = make_session(client)["session_id"]
    state = client.app.state
    held = 0
    while state.question_pending.acquire(blocking=False):
        held += 1
    try:
        r = client.post(f"/api/sessions/{sid}/next-question", json_body={})
        assert r.status_code == 429
        assert r.headers.get("Retry-After")
    finally:
        for _ in range(held):
            state.question_pending.release()


# ---------------------------------------------------------------------------
# License lifecycle depth
# ---------------------------------------------------------------------------

def _issue_codes(client, n=1, level="standard"):
    client.post("/api/auth/logout")
    login(client, ADMIN_PHONE)
    r = client.post("/api/admin/licenses/batch",
                    json_body={"count": n, "level": level})
    codes = r.get_json()["codes"]
    client.post("/api/auth/logout")
    return codes


def test_new_license_replaces_old_and_switches_level(client):
    pro = _issue_codes(client, 1, "professional")[0]
    std = _issue_codes(client, 1, "standard")[0]
    login(client, "13900000100")
    r1 = client.post("/api/licenses/activate", json_body={"code": pro})
    lic1 = r1.get_json()["license"]
    assert client.get("/api/auth/me").get_json()["user"]["level"] == \
        "professional"
    r2 = client.post("/api/licenses/activate", json_body={"code": std})
    assert r2.status_code == 200
    assert client.get("/api/auth/me").get_json()["user"]["level"] == \
        "standard"
    # old license released as replaced, with an event trail
    client.post("/api/auth/logout")
    login(client, ADMIN_PHONE)
    old = client.get(f"/api/admin/licenses/{lic1['license_id']}").get_json()
    assert old["status"] == "replaced"
    events = client.get(
        f"/api/admin/licenses/{lic1['license_id']}/events").get_json()
    assert [e["action"] for e in events] == ["issued", "activated",
                                             "replaced"]
    # current license is the standard one
    client.post("/api/auth/logout")
    login(client, "13900000100")
    cur = client.get("/api/licenses/current").get_json()
    assert cur["license"]["level"] == "standard"
    assert cur["license"]["status"] == "active"


def test_reactivating_same_license_is_stable(client):
    code = _issue_codes(client, 1, "standard")[0]
    login(client, "13900000101")
    first = client.post("/api/licenses/activate",
                        json_body={"code": code}).get_json()["license"]
    second = client.post("/api/licenses/activate",
                         json_body={"code": code}).get_json()["license"]
    assert first["license_id"] == second["license_id"]
    assert first["activated_at"] == second["activated_at"]
    assert second["status"] == "active"


def test_license_cannot_be_activated_by_second_account(client):
    code = _issue_codes(client, 1, "standard")[0]
    login(client, "13900000102")
    assert client.post("/api/licenses/activate",
                       json_body={"code": code}).status_code == 200
    client.post("/api/auth/logout")
    login(client, "13900000103")
    r = client.post("/api/licenses/activate", json_body={"code": code})
    # reference web/server.py:10656-10672: bound-to-other-user is 409
    assert r.status_code == 409
    body = r.get_json()
    assert "其他账号" in body["error"]
    assert body["error_code"] == "license_bound_to_other_user"


def test_replaced_license_cannot_be_reactivated(client):
    """A 'replaced' code is terminal (reference web/server.py:10644-10652
    returns 403 license_replaced) — it must never rebind, even for the
    original owner."""
    codes = _issue_codes(client, 2, "standard")
    login(client, "13900000104")
    assert client.post("/api/licenses/activate",
                       json_body={"code": codes[0]}).status_code == 200
    # activating the second code replaces the first
    assert client.post("/api/licenses/activate",
                       json_body={"code": codes[1]}).status_code == 200
    r = client.post("/api/licenses/activate", json_body={"code": codes[0]})
    assert r.status_code == 403
    assert r.get_json()["error_code"] == "license_replaced"
    # ...for another account the binding check wins (409, still refused)
    client.post("/api/auth/logout")
    login(client, "13900000105")
    r = client.post("/api/licenses/activate", json_body={"code": codes[0]})
    assert r.status_code in (403, 409)


def test_revoked_license_drops_access_and_level_follows(client):
    code = _issue_codes(client, 1, "professional")[0]
    login(client, "13900000104")
    lic = client.post("/api/licenses/activate",
                      json_body={"code": code}).get_json()["license"]
    client.post("/api/auth/logout")
    login(client, ADMIN_PHONE)
    r = client.post(f"/api/admin/licenses/{lic['license_id']}/revoke",
                    json_body={"reason": "violation"})
    assert r.status_code == 200
    detail = client.get(
        f"/api/admin/licenses/{lic['license_id']}").get_json()
    assert detail["status"] == "revoked"
    # enforcement on: the revoked user can no longer create sessions
    client.post("/api/admin/license-enforcement",
                json_body={"enabled": True})
    client.post("/api/auth/logout")
    login(client, "13900000104")
    r = client.post("/api/sessions", json_body={
        "topic": "x", "scenario_id": "product-requirement"})
    assert r.status_code == 403
    assert r.get_json().get("license_required") is True


def test_license_bulk_revoke_and_extend(client):
    codes = _issue_codes(client, 3, "standard")
    login(client, ADMIN_PHONE)
    lst = client.get("/api/admin/licenses?status=issued").get_json()
    ids = [x["license_id"] for x in lst["licenses"][:2]] \
        if isinstance(lst, dict) else [x["license_id"] for x in lst[:2]]
    r = client.post("/api/admin/licenses/bulk-revoke",
                    json_body={"license_ids": ids})
    assert r.status_code == 200
    summary = client.get("/api/admin/licenses/summary").get_json()
    assert summary["by_status"].get("revoked", 0) >= 2
    # extend the remaining one
    remaining = [x for x in (lst["licenses"] if isinstance(lst, dict)
                             else lst) if x["license_id"] not in ids]
    lic_id = remaining[0]["license_id"]
    before = client.get(f"/api/admin/licenses/{lic_id}").get_json()
    r = client.post("/api/admin/licenses/bulk-extend",
                    json_body={"license_ids": [lic_id], "days": 30})
    assert r.status_code == 200
    after = client.get(f"/api/admin/licenses/{lic_id}").get_json()
    assert after["expires_at"] > before["expires_at"]
    assert codes  # issued codes stay secret — only hints in listings
    assert all("****" in (x.get("code_hint") or "")
               for x in (lst["licenses"] if isinstance(lst, dict) else lst))


def test_license_search_filters(client):
    _issue_codes(client, 2, "professional")
    login(client, ADMIN_PHONE)
    got = client.get("/api/admin/licenses?status=issued").get_json()
    rows = got["licenses"] if isinstance(got, dict) else got
    assert all(r["status"] == "issued" for r in rows)
    assert all("code_hash" not in r for r in rows)


# ---------------------------------------------------------------------------
# Exports follow the CURRENT level
# ---------------------------------------------------------------------------

def test_export_permission_follows_current_level(client):
    user = login(client, "13900000110")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000110")
    sid = make_session(client, topic="导出等级")["session_id"]
    answer_once(client, sid)
    rep = generate_report(client, sid)
    assert client.post(f"/api/reports/{rep}/exports",
                       json_body={"format": "docx"}).status_code == 201
    assert client.post(f"/api/reports/{rep}/exports",
                       json_body={"format": "pdf"}).status_code == 403
    assert client.get(f"/api/reports/{rep}/appendix/pdf").status_code == 403
    # upgrade unlocks pdf + appendix for the SAME report
    set_level(client, user["user_id"], "professional")
    login(client, "13900000110")
    assert client.post(f"/api/reports/{rep}/exports",
                       json_body={"format": "pdf"}).status_code == 201
    assert client.get(f"/api/reports/{rep}/appendix/pdf").status_code == 200
    # downgrade re-locks
    set_level(client, user["user_id"], "experience")
    login(client, "13900000110")
    assert client.post(f"/api/reports/{rep}/exports",
                       json_body={"format": "docx"}).status_code == 403


def test_export_listing_and_download_roundtrip(client):
    user = login(client, "13900000111")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000111")
    sid = make_session(client, topic="导出下载")["session_id"]
    answer_once(client, sid)
    rep = generate_report(client, sid)
    created = client.post(f"/api/reports/{rep}/exports",
                          json_body={"format": "docx"}).get_json()
    listing = client.get(f"/api/reports/{rep}/exports").get_json()
    assert any(x["asset_id"] == created["asset_id"] for x in listing)
    dl = client.get(
        f"/api/reports/{rep}/exports/{created['asset_id']}")
    assert dl.status_code == 200
    assert dl.data[:2] == b"PK"  # OOXML zip container
    assert "attachment" in dl.headers["Content-Disposition"]
    # other users cannot download my export
    client.post("/api/auth/logout")
    login(client, "13900000112")
    assert client.get(
        f"/api/reports/{rep}/exports/{created['asset_id']}"
    ).status_code == 403


# ---------------------------------------------------------------------------
# Solution share lifecycle
# ---------------------------------------------------------------------------

def test_share_idempotent_and_public_access(client):
    user = login(client, "13900000120")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000120")
    sid = make_session(client, topic="分享")["session_id"]
    answer_once(client, sid)
    rep = generate_report(client, sid)
    t1 = client.post(f"/api/reports/{rep}/solution/share",
                     json_body={}).get_json()["share_token"]
    t2 = client.post(f"/api/reports/{rep}/solution/share",
                     json_body={}).get_json()["share_token"]
    assert t1 == t2  # idempotent per owner+report
    # anonymous access through the public route
    client.post("/api/auth/logout")
    pub = client.get(f"/api/public/solutions/{t1}")
    assert pub.status_code == 200
    payload = pub.get_json()
    assert payload["shared"] is True and payload["report_name"] == rep
    assert client.get("/api/public/solutions/not-a-token").status_code == 404
    # deleting the report kills the share
    login(client, "13900000120")
    client.delete(f"/api/reports/{rep}")
    client.post("/api/auth/logout")
    assert client.get(f"/api/public/solutions/{t1}").status_code == 404


# ---------------------------------------------------------------------------
# Custom scenarios
# ---------------------------------------------------------------------------

CUSTOM_SCENARIO = {
    "id": "supply-chain-audit",
    "name": "供应链审计调研",
    "description": "面向制造企业的供应链风险审计访谈",
    "dimensions": [
        {"id": "risk_map", "name": "风险地图",
         "key_aspects": ["供应商集中度", "关键物料", "交付周期"]},
        {"id": "controls", "name": "控制措施",
         "key_aspects": ["准入审核", "绩效评估"]},
    ],
}


def test_custom_scenario_lifecycle(client):
    user = login(client, "13900000130")
    # experience users cannot create custom scenarios
    assert client.post("/api/scenarios/custom",
                       json_body={"scenario": CUSTOM_SCENARIO}
                       ).status_code == 403
    set_level(client, user["user_id"], "standard")
    login(client, "13900000130")
    r = client.post("/api/scenarios/custom",
                    json_body={"scenario": CUSTOM_SCENARIO})
    assert r.status_code == 201, r.text
    listed = {s["id"] for s in client.get("/api/scenarios").get_json()}
    assert "supply-chain-audit" in listed
    # usable for a session; dimensions drive the interview
    s = make_session(client, topic="供应链审计试点",
                     scenario_id="supply-chain-audit")
    assert set(s["dimensions"]) == {"risk_map", "controls"}
    q = client.post(f"/api/sessions/{s['session_id']}/next-question",
                    json_body={}).get_json()
    assert q["dimension"] == "risk_map"


def test_custom_scenario_owner_scoped_delete(client):
    user = login(client, "13900000131")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000131")
    client.post("/api/scenarios/custom",
                json_body={"scenario": CUSTOM_SCENARIO})
    client.post("/api/auth/logout")
    other = login(client, "13900000132")
    set_level(client, other["user_id"], "standard")
    login(client, "13900000132")
    assert client.delete(
        "/api/scenarios/custom/supply-chain-audit").status_code == 403
    client.post("/api/auth/logout")
    login(client, "13900000131")
    assert client.delete(
        "/api/scenarios/custom/supply-chain-audit").status_code == 200


def test_custom_scenario_persists_across_app_restart():
    tmp = tempfile.TemporaryDirectory()
    app = _mkapp(tmp.name)
    try:
        c = app.test_client()
        user = login(c, "13900000133")
        set_level(c, user["user_id"], "standard")
        login(c, "13900000133")
        assert c.post("/api/scenarios/custom",
                      json_body={"scenario": CUSTOM_SCENARIO}
                      ).status_code == 201
    finally:
        app.state.shutdown()
    app2 = _mkapp(tmp.name)
    try:
        c2 = app2.test_client()
        login(c2, "13900000133")
        sc = c2.get("/api/scenarios/supply-chain-audit").get_json()
        assert sc["name"] == "供应链审计调研"
        assert len(sc["dimensions"]) == 2
    finally:
        app2.state.shutdown()
        tmp.cleanup()


def test_scenario_rejects_malformed_payloads(client):
    user = login(client, "13900000134")
    set_level(client, user["user_id"], "standard")
    login(client, "13900000134")
    for bad in (
        {},  # empty
        {"id": "x", "name": "y"},  # no dimensions
        {"id": "x", "name": "y", "dimensions": "not-a-list"},
    ):
        r = client.post("/api/scenarios/custom", json_body={"scenario": bad})
        assert r.status_code == 400, bad


# ---------------------------------------------------------------------------
# Report templates
# ---------------------------------------------------------------------------

def test_report_template_validate_and_preview(client):
    login(client, "13900000140")
    good = {"sections": [{"id": "s1", "title": "概述"},
                         {"id": "s2", "title": "风险"}]}
    r = client.post("/api/report-templates/validate", json_body=good)
    assert r.get_json() == {"valid": True, "problems": []}
    bad = {"sections": [{"id": "s1"}, 42]}
    problems = client.post("/api/report-templates/validate",
                           json_body=bad).get_json()["problems"]
    assert len(problems) == 2
    md = client.post("/api/report-templates/preview", json_body={
        "title": "模板预览", **good}).get_json()["markdown"]
    assert "# 模板预览" in md and "## 概述" in md and "## 风险" in md


# ---------------------------------------------------------------------------
# Thinking status + report status machine over HTTP
# ---------------------------------------------------------------------------

def test_thinking_status_payload(client):
    login(client, "13900000150")
    sid = make_session(client)["session_id"]
    client.post(f"/api/sessions/{sid}/next-question", json_body={})
    st = client.get(f"/api/status/thinking/{sid}").get_json()
    assert st["active"] is False
    assert st["stage"] == "完成"
    assert {"stage_index", "total_stages", "message"} <= set(st)


def test_report_status_machine_fields(client):
    login(client, "13900000151")
    sid = make_session(client)["session_id"]
    answer_once(client, sid)
    generate_report(client, sid)
    st = client.get(f"/api/status/report-generation/{sid}").get_json()
    # A.4 contract fields (reference build_report_generation_payload
    # web/server.py:13549-13607)
    for key in ("active", "processing", "state", "stage_index",
                "total_stages", "progress", "message", "stage_label",
                "updated_at", "report_name", "ai_generated", "v3_enabled",
                "report_profile", "queue_position", "queue_pending",
                "queue_running", "estimated_wait_seconds"):
        assert key in st, key
    assert st["state"] == "completed"
    assert st["progress"] == 1.0
    assert st["total_stages"] == 6


# ---------------------------------------------------------------------------
# Admin users + usage
# ---------------------------------------------------------------------------

def test_admin_users_listing_and_level_change(client):
    login(client, "13900000160")
    client.post("/api/auth/logout")
    login(client, ADMIN_PHONE)
    assert client.get("/api/admin/users").status_code == 400  # q required
    users = client.get("/api/admin/users?q=0160").get_json()
    target = users[0]
    r = client.put(f"/api/admin/users/{target['user_id']}/level",
                   json_body={"level": "professional"})
    assert r.get_json()["level"] == "professional"
    # invalid level rejected
    assert client.put(f"/api/admin/users/{target['user_id']}/level",
                      json_body={"level": "galactic"}).status_code == 400
    # non-admin cannot
    client.post("/api/auth/logout")
    login(client, "13900000161")
    assert client.put(f"/api/admin/users/{target['user_id']}/level",
                      json_body={"level": "standard"}).status_code == 403


def test_admin_usage_aggregates(client):
    login(client, "13900000162")
    sid = make_session(client, topic="用量")["session_id"]
    answer_once(client, sid)
    generate_report(client, sid)
    uid = client.get("/api/auth/me").get_json()["user"]["user_id"]
    client.post("/api/auth/logout")
    login(client, ADMIN_PHONE)
    summary = client.get("/api/admin/usage/summary").get_json()
    assert summary["sessions"] >= 1 and summary["reports"] >= 1
    users = client.get("/api/admin/usage/users").get_json()
    mine = [u for u in users if str(u.get("owner_user_id")) == str(uid)]
    assert mine and mine[0]["sessions"] >= 1 and mine[0]["last_active"]
    detail = client.get(f"/api/admin/usage/users/{uid}").get_json()
    assert detail["session_count"] >= 1
    assert detail["report_count"] >= 1
